"""Native (C++/OpenMP) compact wire encoder vs the numpy path.

The native module's single job is the production H2D encode
(train/steps.py compact_event_view); these tests pin exact equality with
the numpy fallback and that the encoded batch decodes to the identical
device representation.
"""

import numpy as np
import pytest

from ei_nexus_tpu import native
from ei_nexus_tpu.train.steps import (EVENT_COORD_SCALE,
                                      compact_event_view)

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="no C++ toolchain")


def batch_events(rng, B=3, L=4096, n=2000, H=260, W=346, frac=False):
    x = rng.integers(0, W, (B, L)).astype(np.float32)
    y = rng.integers(0, H, (B, L)).astype(np.float32)
    if frac:
        # 1/64-px grid keeps the fixed-point encode exact so the
        # numpy-vs-native comparison is bitwise even off integers
        x += rng.integers(0, 64, (B, L)) / 64.0
        y += rng.integers(0, 64, (B, L)) / 64.0
    t = np.sort(rng.uniform(0, 0.4, (B, L)), axis=1).astype(np.float32)
    p = rng.integers(0, 2, (B, L)).astype(np.float32)
    valid = np.zeros((B, L), bool)
    valid[:, :n] = True
    for arr in (x, y, t, p):
        arr[~valid] = 0.0
    return {"events_x": x, "events_y": y, "events_t": t, "events_p": p,
            "events_valid": valid}


class TestCompactEncode:
    @pytest.mark.parametrize("frac", [False, True])
    def test_matches_numpy(self, rng, frac):
        view = batch_events(rng, frac=frac)
        got = native.compact_encode(
            view["events_x"], view["events_y"], view["events_p"],
            view["events_valid"], EVENT_COORD_SCALE)
        assert got is not None
        xq, yq, pq, n = got
        np.testing.assert_array_equal(
            xq, np.round(view["events_x"] * EVENT_COORD_SCALE)
            .astype(np.uint16))
        np.testing.assert_array_equal(
            yq, np.round(view["events_y"] * EVENT_COORD_SCALE)
            .astype(np.uint16))
        np.testing.assert_array_equal(
            pq, view["events_p"].astype(np.uint8))
        np.testing.assert_array_equal(
            n, view["events_valid"].sum(1).astype(np.int32))

    def test_compact_event_view_uses_native(self, rng):
        """The production entry point produces identical wire dicts with
        and without the native library."""
        view = batch_events(rng)
        fast = compact_event_view(view, keep=())
        # force the numpy fallback by breaking the fast-path layout
        view64 = dict(view)
        view64["events_x"] = view["events_x"].astype(np.float64)
        slow = compact_event_view(view64, keep=())
        for k in fast:
            np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)

    def test_empty_rows(self):
        view = {"events_x": np.zeros((2, 16), np.float32),
                "events_y": np.zeros((2, 16), np.float32),
                "events_t": np.zeros((2, 16), np.float32),
                "events_p": np.zeros((2, 16), np.float32),
                "events_valid": np.zeros((2, 16), bool)}
        got = native.compact_encode(
            view["events_x"], view["events_y"], view["events_p"],
            view["events_valid"], EVENT_COORD_SCALE)
        assert got is not None
        assert (got[3] == 0).all()
        enc = compact_event_view(view)
        assert (np.asarray(enc["events_n"]) == 0).all()
