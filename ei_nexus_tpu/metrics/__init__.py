"""Evaluation metrics: keypoint repeatability/descriptor distance, matching
ratio/accuracy, homography estimation, relative pose estimation, AUC.

Parity with reference `core/metrics/` (keypoints_metrics.py,
matching_metrics.py, util.py). The RANSAC-based estimators offer two
backends: "opencv" (host, exactly the reference's protocol) and "jax"
(batched 8-point essential RANSAC on-device, `ransac.py`) for high-throughput
full-pipeline benchmarks."""

from .auc import compute_auc
from .keypoints import detection_metric, Repeatability, \
    ValidDescriptorsDistance
from .matching import (
    MatchingRatio, MeanMatchingAccuracy, HomographyEstimation,
    RelativePoseEstimation,
)
from .ransac import estimate_essential_ransac, recover_pose_from_essential

__all__ = [
    "compute_auc", "detection_metric", "Repeatability",
    "ValidDescriptorsDistance", "MatchingRatio", "MeanMatchingAccuracy",
    "HomographyEstimation", "RelativePoseEstimation",
    "estimate_essential_ransac", "recover_pose_from_essential",
]
