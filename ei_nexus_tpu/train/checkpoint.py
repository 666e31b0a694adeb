"""Checkpointing: orbax-backed save/restore + cross-stage surgery.

Parity with the reference's torch.save({epoch, model/optimizer/scheduler
state_dict}) checkpoints (train_extractor.py:343-371, resume :163-170) and
the stage-transfer key-prefix surgery (EIM.py:29-42: stage-1 ckpt ->
`event_extractor.*`, stage-2 ckpt -> `matcher.*`). Under flax the subtrees
are first-class dict keys, so "surgery" is a subtree copy.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, state, epoch: int,
                    name: Optional[str] = None) -> str:
    """Save {params, batch_stats, opt_state, step, epoch} (sharded-safe)."""
    name = name or f"checkpoint_{epoch}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(epoch),
    }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state, params_only: bool = False):
    """Restore into an existing TrainState template. Returns
    (state, epoch).

    params_only=True skips the optimizer state — used by the eval entry
    points, whose throwaway optimizer does not match the training one
    (the reference loads only model state_dict at eval,
    test_events-image_different_time.py:156).
    """
    ckptr = _checkpointer()
    if params_only:
        raw = _restore_raw(path)
        new_state = state.replace(params=raw["params"],
                                  batch_stats=raw["batch_stats"],
                                  step=raw["step"])
        return new_state, int(np.asarray(raw["epoch"]))
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(0),
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    new_state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=restored["step"])
    return new_state, int(restored["epoch"])


def restore_any_checkpoint(path: str, state, model_config):
    """Eval-CLI checkpoint ingest: orbax dir OR reference torch .pth.

    A `.pth`/`.pt` path is treated as a reference-format full-EIM state
    dict (the released-checkpoint layout the reference eval loads at
    test_events-image_different_time.py:156) and ported through
    models.port_torch onto this state's variables; anything else restores
    as a native orbax checkpoint. Returns (state, epoch) — epoch is 0 for
    torch files (they carry no trainer state)."""
    if str(path).endswith((".pth", ".pt")):
        from ei_nexus_tpu.models.port_torch import load_eim_checkpoint_file
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        ported = load_eim_checkpoint_file(
            path, variables,
            image_extractor_type=model_config.image_extractor.type,
            matcher_type=model_config.matcher.type,
            n_lightglue_layers=model_config.matcher.lightglue.n_layers,
            use_batchnorm=model_config.event_extractor.use_batchnorm)
        return state.replace(params=ported["params"],
                             batch_stats=ported.get("batch_stats", {})), 0
    return restore_checkpoint(path, state, params_only=True)


def _restore_raw(path: str) -> Dict[str, Any]:
    ckptr = _checkpointer()
    return ckptr.restore(os.path.abspath(path))


def load_stage1_event_extractor(path: str, variables: Dict[str, Any]
                                ) -> Dict[str, Any]:
    """Copy a stage-1 checkpoint's event_extractor subtree into model
    variables (reference EIM.py:29-35 prefix strip)."""
    ckpt = _restore_raw(path)
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy tree
    out["params"] = dict(out["params"])
    out["params"]["event_extractor"] = ckpt["params"]["event_extractor"]
    if "batch_stats" in out and "event_extractor" in ckpt.get(
            "batch_stats", {}):
        out["batch_stats"] = dict(out["batch_stats"])
        out["batch_stats"]["event_extractor"] = \
            ckpt["batch_stats"]["event_extractor"]
    return out


def load_stage2_matcher(path: str, variables: Dict[str, Any]
                        ) -> Dict[str, Any]:
    """Copy a stage-2 checkpoint's matcher subtree into model variables
    (reference EIM.py:36-42)."""
    ckpt = _restore_raw(path)
    out = jax.tree_util.tree_map(lambda x: x, variables)
    out["params"] = dict(out["params"])
    out["params"]["matcher"] = ckpt["params"]["matcher"]
    return out
