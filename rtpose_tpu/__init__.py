"""rtpose-TPU: a TPU-native realtime multi-person 2D pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the bottom-up Part-Affinity-Field
pose pipeline (OpenPose / rtpose, CVPR'17), with the capabilities of the
PyTorch reference implementation it mirrors:

- CNN model zoo (VGG19 rtpose, stacked hourglass, ShuffleNetV2, MobileNetV2,
  OpenPose-v2, atrous/ASPP) predicting 19 keypoint heatmaps + 38 PAF channels
- fully on-device grouping: peak NMS, PAF line-integral connection scoring,
  greedy assembly into per-person skeletons (fixed-shape XLA/Pallas kernels)
- COCO keypoint training (device-side GT synthesis, pjit data parallelism)
- COCO val evaluation with flip/multi-scale TTA and a native OKS evaluator
- image/video/webcam demos

Package layout: models/ ops/ data/ evalx/ infer/ train/ parallel/ utils/
native/ demo/.
"""

__version__ = "0.1.0"

from . import skeleton  # noqa: F401  (lightweight, no jax import)
from .config import Config, load_config  # noqa: F401
