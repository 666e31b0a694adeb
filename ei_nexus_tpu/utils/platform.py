"""Platform selection helper.

The deployment environment may pin JAX at a remote TPU via a sitecustomize
hook that overrides the JAX_PLATFORMS env var (jax.config wins over env).
`apply_platform` lets configs/scripts choose explicitly: device: tpu | cpu.
"""

from __future__ import annotations

import os
from typing import Optional


def apply_platform(device: Optional[str]) -> None:
    import jax
    if not device or device in ("tpu", "auto", "default"):
        return
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_platforms", device)
