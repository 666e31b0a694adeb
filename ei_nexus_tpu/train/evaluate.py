"""Evaluation loops: extractor validation (same-time) and RPE benchmarks.

Parity with reference `val_extractor.py:62` (val_model_by_loss: R@1/3, VVD,
MMA@1/3, MR, HE + val losses with identity homography),
`val_matcher.py:39`, `test_events-image_same-time.py` and
`test_events-image_different_time.py:125` (the headline RPE protocol:
per-pair matched keypoints -> essential RANSAC -> angular errors ->
AUC@{5,10,20}).

The forward pass is one jitted eval step; metric aggregation is host-side
numpy on the fixed-K masked outputs (ragged views recovered by masking).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional

import numpy as np
import jax

from ..metrics import (
    Repeatability, ValidDescriptorsDistance, MatchingRatio,
    MeanMatchingAccuracy, HomographyEstimation, RelativePoseEstimation,
)
from .steps import make_eval_step


def _unmask(arr, valid):
    return np.asarray(arr)[np.asarray(valid)]


def _matched_pairs(matches: Dict, feats0: Dict, feats1: Dict, b: int):
    """Recover the ragged matched keypoint lists of sample b (reference
    matched_kpts0/1 outputs) from fixed-K arrays.

    Match indices address the matcher's PADDED slot space
    (max_points_num), which can exceed the extractor's K (e.g. SiLK's 512
    keypoints in 1024 matcher slots) — take keypoints from the matcher's
    own input feats, falling back to the extractor feats for matchers
    that do not report them."""
    f0 = matches.get("input_feats0", feats0)
    f1 = matches.get("input_feats1", feats1)
    m0 = np.asarray(matches["matches0"][b])
    kp0 = np.asarray(f0["sparse_positions"][b])
    kp1 = np.asarray(f1["sparse_positions"][b])
    sel = m0 > -1
    return kp0[sel], kp1[m0[sel]]


def val_extractor(state, model, loader, rep_kind: str, bins: int,
                  height: int, width: int,
                  losses: Optional[Dict[str, Callable]] = None,
                  max_batches: Optional[int] = None) -> Dict[str, float]:
    """Same-time validation: keypoint/descriptor/matching metrics under the
    identity homography + optional distillation val losses."""
    step = make_eval_step(model, rep_kind, bins, height, width)
    rep1 = Repeatability("R@1", 1, ordering="yx")
    rep3 = Repeatability("R@3", 3, ordering="yx")
    vvd = ValidDescriptorsDistance("VVD", [1, 3], ordering="yx")
    mma1 = MeanMatchingAccuracy("MMA@1", 1, ordering="yx")
    mma3 = MeanMatchingAccuracy("MMA@3", 3, ordering="yx")
    mr = MatchingRatio("MR")
    he = HomographyEstimation("HE", [3, 5, 10], ordering="yx")
    eye = np.eye(3)
    acc: Dict[str, List[float]] = {}

    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        ev, im, matches = step(state, batch)
        if losses is not None:
            from .steps import batch_representation
            import jax.numpy as jnp
            _, mask = batch_representation(
                {k: jnp.asarray(v) for k, v in batch[0].items()
                 if k.startswith("events")}, rep_kind, bins, height, width)
            for name in ("keypoints_loss", "descriptors_loss"):
                l, _ = losses[name](ev, im, mask)
                acc.setdefault(f"val_{name}", []).append(float(l))
        B = np.asarray(ev["sparse_positions"]).shape[0]
        for b in range(B):
            p0 = _unmask(ev["sparse_positions"][b], ev["sparse_valid"][b])
            p1 = _unmask(im["sparse_positions"][b], im["sparse_valid"][b])
            d0 = _unmask(ev["sparse_descriptors"][b], ev["sparse_valid"][b])
            d1 = _unmask(im["sparse_descriptors"][b], im["sparse_valid"][b])
            shp = (height, width)
            for m, args in ((rep1, (p0[:, :2], p1[:, :2], shp, shp, eye)),
                            (rep3, (p0[:, :2], p1[:, :2], shp, shp, eye))):
                out = m.update_one(*args)
                for k, v in out.items():
                    acc.setdefault(k, []).append(v)
            out = vvd.update_one(p0[:, :2], p1[:, :2], d0, d1, shp, shp, eye)
            for k, v in out.items():
                acc.setdefault(k, []).append(v)
            mk0, mk1 = _matched_pairs(matches, ev, im, b)
            for k, v in mr.update_one(mk0, mk1, p0, p1).items():
                acc.setdefault(k, []).append(v)
            if len(mk0):
                for m in (mma1, mma3):
                    for k, v in m.update_one(mk0[:, :2], mk1[:, :2],
                                             eye).items():
                        acc.setdefault(k, []).append(v)
                for k, v in he.update_one(shp, mk0, mk1, eye).items():
                    acc.setdefault(k, []).append(v)

    out = {k: float(np.mean([x for x in v if np.isfinite(x)] or [np.nan]))
           for k, v in acc.items()}
    out.update({f"HE@{t}_auc": v for t, v in zip(
        (3, 5, 10), (he.compute_all_auc()[f"{t}"] for t in (3, 5, 10)))})
    return out


def rpe_eval(state, model, loader, rep_kind: str, bins: int, height: int,
             width: int, pose_thresh=(5, 10, 20), ransac_thresh: float = 1.0,
             backend: str = "opencv", solver: str = "5pt",
             max_batches: Optional[int] = None) -> Dict[str, float]:
    """Time-separated RPE benchmark (the headline metric). `solver` picks
    the jax backend's minimal solver: 8pt or 5pt (cv2 protocol family)."""
    step = make_eval_step(model, rep_kind, bins, height, width)
    rpe = RelativePoseEstimation("RPE", list(pose_thresh),
                                 ransac_thresh=ransac_thresh, ordering="yx",
                                 backend=backend, solver=solver)
    acc: Dict[str, List[float]] = {}
    n_pairs = 0
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        data0, data1, T01, _ = batch[:4]
        ev, im, matches = step(state, batch)
        B = np.asarray(T01).shape[0]
        if backend == "jax":
            # one device RANSAC call for the whole batch
            # (metrics/ransac.py:estimate_pose_batch_from_matches).
            # Positions come from the matcher's padded slot space, which
            # the match indices address (it can exceed the extractor K)
            f0 = matches.get("input_feats0", ev)
            f1 = matches.get("input_feats1", im)
            outs = rpe.update_batch_device(
                f0["sparse_positions"], f1["sparse_positions"],
                matches["matches0"], data0["K"], data1["K"], T01)
            for out in outs:
                for k, v in out.items():
                    acc.setdefault(k, []).append(v)
            n_pairs += B
        else:
            for b in range(B):
                mk0, mk1 = _matched_pairs(matches, ev, im, b)
                out = rpe.update_one(mk0, mk1, data0["K"][b],
                                     data1["K"][b], T01[b])
                for k, v in out.items():
                    acc.setdefault(k, []).append(v)
                n_pairs += 1
    summary = {}
    for k, v in acc.items():
        arr = np.asarray(v, np.float64)
        arr = arr[np.isfinite(arr)]
        summary[k] = float(arr.mean()) if arr.size else float("nan")
    auc = rpe.compute_all_auc()
    for t in pose_thresh:
        summary[f"RPE@{t}_auc"] = auc[f"{t}"]
    summary["n_pairs"] = n_pairs
    return summary
