"""Optimizer + LR schedule factories on optax.

Parity with reference `utils/optimizers.py:7` (Adam/AdamW/SGD) and
`utils/schedulers.py:7` (the scheduler zoo). Schedules are step-indexed and
jnp-traceable (optax calls them with a traced count inside the jitted
update); the reference's epoch-stepped torch schedulers are mapped via
`steps_per_epoch` (epoch-granular evaluation, identical trajectories).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Mapping, Optional

import jax.numpy as jnp
import optax


def build_schedule(config: Mapping[str, Any], base_lr: float,
                   steps_per_epoch: int = 1) -> Callable:
    stype = config.get("type", "CosineAnnealingLR")
    p = config.get(stype) or {}
    spe = max(steps_per_epoch, 1)

    if stype == "StepLR":
        step_size = p.get("step_size", 200)
        gamma = p.get("gamma", 0.1)
        return lambda step: base_lr * gamma ** ((step // spe) // step_size)
    if stype == "MultiStepLR":
        milestones = jnp.asarray(sorted(p.get("milestones", [10, 20, 30])))
        gamma = p.get("gamma", 0.1)

        def sched(step):
            epoch = step // spe
            k = jnp.sum(epoch >= milestones)
            return base_lr * gamma ** k
        return sched
    if stype == "ExponentialLR":
        gamma = p.get("gamma", 0.1)
        return lambda step: base_lr * gamma ** (step // spe)
    if stype == "CosineAnnealingLR":
        T_max = p.get("T_max", 50)
        eta_min = p.get("eta_min", 0.0)

        def sched(step):
            epoch = jnp.minimum(step // spe, T_max)
            return eta_min + (base_lr - eta_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * epoch / T_max))
        return sched
    if stype == "CosineAnnealingWarmRestarts":
        T_0 = p.get("T_0", 10)
        T_mult = p.get("T_mult", 1)
        eta_min = p.get("eta_min", 0.0)

        def sched(step):
            epoch = step // spe
            if T_mult == 1:
                t_i = T_0
                t_cur = epoch % T_0
            else:
                # closed form for geometric restart lengths
                n = jnp.floor(jnp.log(
                    epoch * (T_mult - 1) / T_0 + 1) / math.log(T_mult))
                start = T_0 * (T_mult ** n - 1) / (T_mult - 1)
                t_i = T_0 * T_mult ** n
                t_cur = epoch - start
            return eta_min + (base_lr - eta_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * t_cur / t_i))
        return sched
    if stype == "CyclicLR":
        lo = p.get("base_lr", base_lr / 10)
        hi = p.get("max_lr", base_lr)
        up = p.get("step_size_up", 2000)
        down = p.get("step_size_down") or up

        def sched(step):
            pos = step % (up + down)
            rising = lo + (hi - lo) * pos / up
            falling = hi - (hi - lo) * (pos - up) / down
            return jnp.where(pos < up, rising, falling)
        return sched
    if stype == "OneCycleLR":
        max_lr = p.get("max_lr", base_lr)
        total = p.get("total_steps") or (p.get("epochs", 10) * spe)
        return optax.cosine_onecycle_schedule(
            transition_steps=total, peak_value=max_lr,
            pct_start=p.get("pct_start", 0.3),
            div_factor=p.get("div_factor", 25.0),
            final_div_factor=p.get("final_div_factor", 1e4))
    if stype in ("LambdaLR", "MultiplicativeLR", "ReduceLROnPlateau"):
        # plateau/lambda schedules are host-driven; constant here (the
        # trainer may scale lr externally via optax.inject_hyperparams)
        return lambda step: base_lr
    raise NotImplementedError(f"scheduler {stype!r}")


def build_optimizer(config: Mapping[str, Any], schedule: Callable
                    ) -> optax.GradientTransformation:
    """optimizer config (reference utils/optimizers.py) -> optax chain."""
    otype = config.get("type", "AdamW")
    p = config.get(otype) or {}
    if otype == "Adam":
        betas = p.get("betas", [0.9, 0.999])
        wd = float(p.get("weight_decay", 0.0))
        if wd:
            # torch Adam's weight_decay is L2 (coupled)
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.adam(schedule, b1=betas[0], b2=betas[1],
                           eps=float(p.get("eps", 1e-8))))
        return optax.adam(schedule, b1=betas[0], b2=betas[1],
                          eps=float(p.get("eps", 1e-8)))
    if otype == "AdamW":
        betas = p.get("betas", [0.9, 0.999])
        return optax.adamw(schedule, b1=betas[0], b2=betas[1],
                           eps=float(p.get("eps", 1e-8)),
                           weight_decay=float(p.get("weight_decay", 1e-5)))
    if otype == "SGD":
        chain = []
        wd = float(p.get("weight_decay", 0.0))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.sgd(schedule, momentum=p.get("momentum", 0.9),
                               nesterov=p.get("nesterov", False)))
        return optax.chain(*chain)
    raise NotImplementedError(f"optimizer {otype!r}")
