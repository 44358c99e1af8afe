"""Hand-written Pallas TPU kernels for the framework's non-conv hot ops.

Both kernels are bit-identical to their XLA counterparts (verified on TPU)
and are kept as alternatives; the XLA implementations remain the defaults
because XLA's fused lowerings measured slightly faster for these
memory-light ops (see each module's docstring for numbers).
"""

from single_person_pose_estimation_tpu.ops.pallas.decode_kernel import (
    decode_batch_pallas,
)
from single_person_pose_estimation_tpu.ops.pallas.heatmap_kernel import (
    render_heatmaps_batch_pallas,
)
