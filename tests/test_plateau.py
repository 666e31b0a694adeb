"""Host-driven ReduceLROnPlateau: trajectory parity vs torch and wiring
into an inject_hyperparams optimizer (reference utils/schedulers.py:45-57).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ei_nexus_tpu.train import (build_optimizer, PlateauController,
                                set_learning_rate, get_learning_rate,
                                is_host_driven)


def torch_trajectory(metrics, base_lr, **kw):
    import torch
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **kw)
    lrs = []
    for m in metrics:
        sched.step(m)
        lrs.append(opt.param_groups[0]["lr"])
    return lrs


@pytest.mark.parametrize("kw", [
    dict(mode="min", factor=0.5, patience=2, threshold=1e-4,
         threshold_mode="rel", cooldown=0, min_lr=1e-5),
    dict(mode="min", factor=0.1, patience=0, threshold=1e-2,
         threshold_mode="abs", cooldown=2, min_lr=0.0),
    dict(mode="max", factor=0.3, patience=3, threshold=1e-3,
         threshold_mode="rel", cooldown=1, min_lr=1e-6),
])
def test_trajectory_matches_torch(kw):
    rng = np.random.default_rng(0)
    # a noisy plateauing loss curve (decreasing then flat), and for mode=max
    # an increasing-then-flat accuracy curve
    n = 40
    if kw["mode"] == "min":
        metrics = np.concatenate([
            1.0 / (1 + np.arange(15)), 0.07 + 0.001 * rng.random(n - 15)])
    else:
        metrics = np.concatenate([
            np.linspace(0.1, 0.9, 15), 0.9 + 0.001 * rng.random(n - 15)])
    ours = PlateauController(base_lr=0.1, **kw)
    got = [ours.step(m) for m in metrics]
    want = torch_trajectory(metrics, 0.1, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_state_dict_roundtrip_continues_identically():
    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.9, 0.89, 0.89, 0.89]
    a = PlateauController(0.1, patience=1, factor=0.5)
    for m in metrics[:4]:
        a.step(m)
    b = PlateauController(0.1, patience=1, factor=0.5)
    b.load_state_dict(a.state_dict())
    rest_a = [a.step(m) for m in metrics[4:]]
    rest_b = [b.step(m) for m in metrics[4:]]
    assert rest_a == rest_b


def test_inject_lr_controls_update_magnitude():
    cfg = {"type": "SGD", "SGD": {"momentum": 0.0, "weight_decay": 0.0,
                                  "nesterov": False}}
    tx = build_optimizer(cfg, 0.1, inject_lr=True)
    params = {"w": jnp.ones(4)}
    opt_state = tx.init(params)
    assert get_learning_rate(opt_state) == pytest.approx(0.1)
    g = {"w": jnp.ones(4)}
    upd, opt_state2 = tx.update(g, opt_state, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), -0.1, rtol=1e-6)
    # halve the lr on the host mid-training
    opt_state2 = set_learning_rate(opt_state2, 0.05)
    upd2, _ = tx.update(g, opt_state2, params)
    np.testing.assert_allclose(np.asarray(upd2["w"]), -0.05, rtol=1e-6)


def test_is_host_driven():
    assert is_host_driven({"type": "ReduceLROnPlateau"})
    assert not is_host_driven({"type": "CosineAnnealingLR"})
