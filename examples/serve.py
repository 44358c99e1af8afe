"""Production-shaped serving: a micro-batching PoseServer over images.

No reference-notebook counterpart (the reference's closest analog is the
Colab webcam loop, one synchronous predict per frame —
javascript_utils.py); this is the capability rebuilt for a TPU chip:
bucketed static shapes (one compile per bucket, ever), uint8 wire format
normalized on device, pipelined readback, latency/batching stats.

Usage:
    python examples/serve.py "images/*.jpg"
or via the CLI:
    python -m single_person_pose_estimation_tpu.cli serve --images "..."
"""
import glob

import numpy as np

from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.data.images import (
    read_image,
    resize_bilinear,
)
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.serving import PoseServer
from single_person_pose_estimation_tpu.utils.model_utils import (
    load_model_from_checkpoint,
)

if __name__ == "__main__":
    import sys

    cfg = Config().replace(hg_num_stacks=4)
    model = StackedHourglass(num_stacks=4, num_channels=cfg.hg_num_channels)
    state, _ = load_model_from_checkpoint(model, cfg.checkpoints_path,
                                          best=True)
    server = PoseServer(model, state.params, state.batch_stats,
                        buckets=(1, 8, 32))
    server.warmup()
    futures = {}
    for path in sorted(glob.glob(sys.argv[1] if len(sys.argv) > 1
                                 else "*.jpg")):
        img = read_image(path).astype(np.float32) / 255.0
        img = resize_bilinear(img, (cfg.image_height, cfg.image_width))
        futures[path] = server.submit(img)
    for path, fut in futures.items():
        kps = fut.result()  # (17, 3): x, y, confidence in heatmap units
        print(path, np.round(np.asarray(kps), 2).tolist())
    print(server.stats())
    server.close()
