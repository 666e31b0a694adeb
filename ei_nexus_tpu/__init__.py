"""EI-Nexus-TPU: a TPU-native event-image feature extraction & matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ZhonghuaYi/EI-Nexus_official (event-camera keypoint extraction, event-image
matching with MNN / LightGlue, relative-pose evaluation, two-stage training),
built TPU-first:

 - fixed-shape, mask-threaded keypoint pipelines (no ragged tensors),
 - NHWC conv stacks in bfloat16 feeding the MXU,
 - Pallas kernels for the postprocessing hot path (NMS),
 - `jax.sharding.Mesh` + `jit` data/model-parallel training over ICI,
 - host-side C++ event rasterization feeding a streaming input pipeline.

Layer map (mirrors the reference's L0-L6, see SURVEY.md):
  data/      - L0 dataset ingestion + event representations
  models/    - L1-L3 neural blocks, extractors, matchers, composite models
  geometry/  - L4 SE3/camera/epipolar/depth/GT-match generation
  losses/    - L4 distillation + matcher losses
  metrics/   - L4 keypoint/matching/pose metrics
  train/     - L5/L6 training harness, optimizers, schedulers, checkpointing
  parallel/  - mesh/sharding utilities, distributed bundle adjustment
  ops/       - shared jit/Pallas kernels (NMS, sampling, resize, padding)
  utils/     - config system, logging
"""

__version__ = "0.1.0"
