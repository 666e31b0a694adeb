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
    if stype == "ReduceLROnPlateau":
        # host-driven: the step-indexed schedule is constant; the trainer
        # adjusts the injected lr hyperparam between epochs via
        # PlateauController + set_learning_rate (build the optimizer with
        # inject_lr=True). Reference utils/schedulers.py:45-57.
        return lambda step: base_lr
    raise NotImplementedError(f"scheduler {stype!r}")


def is_host_driven(config: Mapping[str, Any]) -> bool:
    """True for scheduler types whose lr is adjusted between steps on the
    host (plateau family) rather than computed from the step index."""
    return config.get("type") == "ReduceLROnPlateau"


class PlateauController:
    """Host-side ReduceLROnPlateau with torch-exact semantics.

    The reference builds torch's ReduceLROnPlateau (utils/schedulers.py:
    45-57). On TPU the lr cannot branch on a loss inside the compiled step,
    so the controller runs on the host: call `step(metric)` once per epoch
    and write the returned lr into the optimizer's injected hyperparams
    with `set_learning_rate`. Matches torch's update rule: after `patience`
    epochs without `threshold`-sized improvement, lr *= factor (clamped at
    min_lr, skipped when the change is below eps), with a `cooldown`.
    """

    def __init__(self, base_lr: float, mode: str = "min",
                 factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, threshold_mode: str = "rel",
                 cooldown: int = 0, min_lr: float = 0.0,
                 eps: float = 1e-8):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        assert factor < 1.0
        self.lr = float(base_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.eps = eps
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    @classmethod
    def from_config(cls, config: Mapping[str, Any], base_lr: float
                    ) -> "PlateauController":
        p = config.get("ReduceLROnPlateau") or {}
        return cls(base_lr, mode=p.get("mode", "min"),
                   factor=p.get("factor", 0.1),
                   patience=p.get("patience", 10),
                   threshold=p.get("threshold", 1e-4),
                   threshold_mode=p.get("threshold_mode", "rel"),
                   cooldown=p.get("cooldown", 0),
                   min_lr=p.get("min_lr", 0.0), eps=p.get("eps", 1e-8))

    def _is_better(self, a: float, best: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < best * (1.0 - self.threshold)
            return a < best - self.threshold
        if self.threshold_mode == "rel":
            return a > best * (1.0 + self.threshold)
        return a > best + self.threshold

    def step(self, metric: float) -> float:
        """Record one epoch's monitored metric; returns the (possibly
        reduced) learning rate."""
        current = float(metric)
        if self._is_better(current, self.best):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    # -- resume (reference saves scheduler.state_dict()) -------------------
    def state_dict(self) -> Dict[str, Any]:
        return {"lr": self.lr, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, sd: Mapping[str, Any]) -> None:
        self.lr = float(sd["lr"])
        self.best = float(sd["best"])
        self.num_bad_epochs = int(sd["num_bad_epochs"])
        self.cooldown_counter = int(sd["cooldown_counter"])


def set_learning_rate(opt_state, lr: float):
    """Write a new lr into an optax.inject_hyperparams opt_state (works
    with both InjectHyperparamsState and InjectStatefulHyperparamsState)."""
    assert hasattr(opt_state, "hyperparams"), (
        "optimizer was not built with inject_lr=True")
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state) -> float:
    assert hasattr(opt_state, "hyperparams")
    return float(opt_state.hyperparams["learning_rate"])


def build_optimizer(config: Mapping[str, Any], schedule: Callable,
                    inject_lr: bool = False
                    ) -> optax.GradientTransformation:
    """optimizer config (reference utils/optimizers.py) -> optax chain.

    inject_lr=True (host-driven schedulers, see PlateauController) exposes
    the lr as a runtime-adjustable hyperparam in the opt_state instead of
    baking in the schedule callable.
    """
    if inject_lr:
        base = float(schedule(0)) if callable(schedule) else float(schedule)

        def _make(learning_rate):
            return build_optimizer(config, learning_rate, inject_lr=False)
        return optax.inject_hyperparams(_make)(learning_rate=base)
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
