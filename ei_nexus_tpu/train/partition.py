"""Parameter freezing via gradient masking.

The reference freezes submodules with requires_grad=False + module.eval()
(Extractors.py:81-87, Matchers.py:373-378). Under JAX's functional model the
equivalent is a gradient mask: frozen top-level subtrees (e.g.
`image_extractor`, `matcher`) contribute zero gradient, so their params and
optimizer moments never move. BatchNorm running stats of frozen modules are
likewise kept unmutated by running them with train=False inside the model
(EIM passes per-submodule train flags).
"""

from __future__ import annotations

from typing import Any, Iterable, Set

import jax
import jax.numpy as jnp


def freeze_mask(params: Any, frozen_roots: Iterable[str]) -> Any:
    """Pytree of bools: True = trainable, False = frozen, decided by the
    top-level module name."""
    frozen: Set[str] = set(frozen_roots)

    def mask_subtree(tree, is_frozen):
        return jax.tree_util.tree_map(lambda _: not is_frozen, tree)

    return {k: mask_subtree(v, k in frozen) for k, v in params.items()}


def apply_freeze(grads: Any, mask: Any) -> Any:
    """Zero out gradients where mask is False."""
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


def frozen_roots_from_config(config) -> Set[str]:
    """EIMConfig -> set of frozen top-level module names."""
    roots = set()
    if config.event_extractor.freeze:
        roots.add("event_extractor")
    if config.image_extractor.freeze:
        roots.add("image_extractor")
    if config.matcher.freeze:
        roots.add("matcher")
    return roots
