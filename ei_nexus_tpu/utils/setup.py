"""Run setup: seeding + determinism knobs.

Parity with reference `utils/common.py:22` (setup: python/numpy/torch seeds,
cudnn.deterministic, tf32 flags). Under JAX, determinism is the default for
a fixed PRNGKey and compiled program; the relevant knobs are the explicit
key threading plus optional XLA determinism flags for scatter ordering.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np


def setup(seed: int = 3407, deterministic_xla: bool = False):
    """Seed all host RNGs and return the root jax PRNGKey.

    deterministic_xla additionally requests bitwise-deterministic XLA
    reductions (slower; mostly relevant for scatter-add orderings).
    """
    random.seed(seed)
    np.random.seed(seed)
    if deterministic_xla:
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_gpu_deterministic_ops" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_tpu_enable_deterministic_reductions=true"
            ).strip()
    import jax
    return jax.random.PRNGKey(seed)
