"""TPU-native stacked-hourglass single-person pose estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the TensorFlow
reference `MindlessBoid/single-person-pose-estimation`: COCO person-crop ETL,
an on-device jit-compiled input pipeline, the stacked hourglass network with
intermediate supervision, heatmap losses, a pjit data-parallel trainer with
checkpoint/resume, heatmap decoding, OKS/PCK evaluation, and a two-stage
multi-person demo.

Import as: `import single_person_pose_estimation_tpu as spe`. The commonly
used entry points are re-exported here; heavyweight modules (data, training,
evaluation, demo) import lazily via their subpackages.
"""

from single_person_pose_estimation_tpu.configs.default_config import (
    COCO_INDEX_FLIP_PAIRS,
    COCO_KEYPOINT_LABELS,
    COCO_SKELETON,
    Config,
)

__version__ = "0.1.0"
__all__ = [
    "Config",
    "COCO_INDEX_FLIP_PAIRS",
    "COCO_KEYPOINT_LABELS",
    "COCO_SKELETON",
    "StackedHourglass",
    "create_hourglass_model",
    "Trainer",
    "DatasetBuilder",
    "PoseServer",
]


def __getattr__(name):
    # Lazy re-exports so `import spe` stays light (no flax/orbax import cost
    # until actually used).
    if name in ("StackedHourglass", "create_hourglass_model"):
        from single_person_pose_estimation_tpu.models import hourglass
        return getattr(hourglass, name)
    if name == "Trainer":
        from single_person_pose_estimation_tpu.training.trainer import Trainer
        return Trainer
    if name == "DatasetBuilder":
        from single_person_pose_estimation_tpu.data.pipeline import (
            DatasetBuilder,
        )
        return DatasetBuilder
    if name == "PoseServer":
        from single_person_pose_estimation_tpu.serving import PoseServer
        return PoseServer
    raise AttributeError(name)
