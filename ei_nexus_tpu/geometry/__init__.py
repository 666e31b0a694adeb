"""Geometry core: SE(3) poses, pinhole cameras, epipolar geometry, depth
reprojection, homography warping and ground-truth match generation.

Everything here is pure `jax.numpy`, shape-static, differentiable and
jit/vmap-compatible. Functional equivalent of the reference's
`core/geometry/` (wrappers.py, epipolar.py, depth.py, gt_generation.py,
homography.py, utils.py).
"""

from .se3 import Pose
from .camera import Camera
from . import epipolar
from . import depthproj
from .gt_matches import gt_matches_from_pose_depth, gt_matches_from_homography
from .homography import warp_points_homography, sample_homography_corners

__all__ = [
    "Pose",
    "Camera",
    "epipolar",
    "depthproj",
    "gt_matches_from_pose_depth",
    "gt_matches_from_homography",
    "warp_points_homography",
    "sample_homography_corners",
]
