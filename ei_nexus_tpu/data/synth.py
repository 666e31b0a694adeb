"""Synthetic event-stream generators with realistic statistics.

Real event-camera streams (the reference's MVSEC/EC recordings,
datasets/MVSEC.py:224-260) are temporally bursty (motion-locked), spatially
clustered (edges + hot pixels), and contain exact timestamp ties (shared
sensor clock ticks). Uniform random events hide exactly the regimes that
stress the voxel splat's chunking and the NMS iteration counts, so tests
and the headline bench draw from this model instead.
"""

from __future__ import annotations

import numpy as np


def bursty_events(rng: np.random.Generator, n: int, height: int, width: int,
                  n_bursts: int = 12, hot_frac: float = 0.3,
                  tie_frac: float = 0.1, t_max: float = 0.4):
    """Sorted (x, y, t, p) float32 arrays with bursts, hot pixels, ties.

    Temporal: timestamps cluster around `n_bursts` burst centers
    (sigma 4 ms), leaving near-empty gaps between bursts. Spatial:
    `hot_frac` of events concentrate on 8 hot pixels. `tie_frac` of
    timestamps are exact duplicates.
    """
    centers = np.sort(rng.uniform(0.05 * t_max, 0.95 * t_max, n_bursts))
    which = rng.integers(0, n_bursts, n)
    t = centers[which] + rng.normal(0, 0.01 * t_max, n)
    t = np.clip(t, 0, t_max)
    n_tie = int(n * tie_frac)
    if n_tie:
        t[:n_tie] = t[rng.integers(0, n, n_tie)]
    t = np.sort(t).astype(np.float32)

    hot = rng.integers(0, [height - 1, width - 1], (8, 2))
    is_hot = rng.uniform(size=n) < hot_frac
    hi = rng.integers(0, len(hot), n)
    x = np.where(is_hot, hot[hi, 1] + rng.uniform(0, 1, n),
                 rng.uniform(0, width - 1, n)).astype(np.float32)
    y = np.where(is_hot, hot[hi, 0] + rng.uniform(0, 1, n),
                 rng.uniform(0, height - 1, n)).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    return x, y, t, p


def bursty_event_batch(rng: np.random.Generator, batch: int, n: int,
                       max_events: int, height: int, width: int,
                       **kwargs):
    """Batched padded views ready for `batch_representation`."""
    from .representations import pad_events
    out = {k: [] for k in ("events_x", "events_y", "events_t", "events_p",
                           "events_valid")}
    for _ in range(batch):
        x, y, t, p = bursty_events(rng, n, height, width, **kwargs)
        xp, yp, tp, pp, m = pad_events(x, y, t, p, max_events)
        for k, v in zip(out, (xp, yp, tp, pp, m)):
            out[k].append(v)
    return {k: np.stack(v) for k, v in out.items()}
