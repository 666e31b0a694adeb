"""Training losses: stage-1 extractor distillation + stage-2 matcher losses.

Functional parity with reference `core/loss/` (extractor_loss.py,
matcher_loss.py, __init__.py build_losses) and the LightGlue in-model deep
supervision loss (lightglue.py:751-800). Pure functions over NHWC arrays."""

from .extractor_loss import (
    score_loss, logits_loss, descriptors_loss, feature_loss,
)
from .matcher_loss import (
    mnn_loss, nll_matcher_loss, nll_weights_from_gt, lightglue_loss,
)
from .factory import build_losses

__all__ = [
    "score_loss", "logits_loss", "descriptors_loss", "feature_loss",
    "mnn_loss", "nll_matcher_loss", "nll_weights_from_gt", "lightglue_loss",
    "build_losses",
]
