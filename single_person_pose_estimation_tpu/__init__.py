"""TPU-native stacked-hourglass single-person pose estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the TensorFlow
reference `MindlessBoid/single-person-pose-estimation`: COCO person-crop ETL,
an on-device jit-compiled input pipeline, the stacked hourglass network with
intermediate supervision, heatmap losses, a pjit data-parallel trainer with
checkpoint/resume, heatmap decoding, OKS/PCK evaluation, and a two-stage
multi-person demo.

Import as: `import single_person_pose_estimation_tpu as spe`.
"""

from single_person_pose_estimation_tpu.configs.default_config import Config

__version__ = "0.1.0"
__all__ = ["Config"]
