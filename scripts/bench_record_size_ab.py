"""A/B: `record_image_size` (pre-resized ETL crops) vs native-size crops.

VERDICT r3 Weak #5 / Next #7: the config documents pre-resized records as
"the remaining host-side dial" (configs/default_config.py:119-126) with
prose instead of a number. This measures it: the same synthetic person-crop
shards written at the native 400^2 crop size (the reference's
gen_tfrecords.py:29 behavior — crops stored as-cropped) and pre-resized to
256^2 (record_image_size=256, the model input size), then the HOST input
pipeline rate (native reader -> JPEG decode -> resize -> stack, the
threaded path bench.py times) is measured interleaved A/B/A/B... and
reported as medians.

The host stage is the from-records bound on real PCIe hosts (this env's
tunnel is wire-bound instead — PERF.md bound analysis), so the host-rate
ratio IS the end-to-end win where it matters. Run on any host:

    python scripts/bench_record_size_ab.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.data.pipeline import DatasetBuilder

ROUNDS = 5
ITERS = 12
BATCH = 64


def host_rate(root, size):
    bench._ensure_bench_records(root, size=size)
    cfg = Config().replace(dataset_dir=root, batch_size=BATCH,
                           train_transfer_dtype="uint8")
    builder = DatasetBuilder(cfg)
    it, vit = builder.build_datasets()
    # Close the unused valid iterator BEFORE timing: its prefetch thread
    # otherwise decodes ~5 f32 batches during the timed window — heavier
    # in the native-400 arm, which biased the ratio (code-review r4).
    vit.close()
    next(it)  # spin up the decode pool + prefetch thread
    t0 = time.perf_counter()
    for _ in range(ITERS):
        next(it)
    rate = BATCH * ITERS / (time.perf_counter() - t0)
    it.close()
    return rate


def main():
    variants = {
        "native400": ("/tmp/spe_recsize_native", 400),
        "resized256": ("/tmp/spe_recsize_256", 256),
    }
    rates = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, (root, size) in variants.items():
            rates[name].append(host_rate(root, size))
            print(f"round {r} {name}: {rates[name][-1]:.1f} img/s",
                  flush=True)
    med = {k: statistics.median(v) for k, v in rates.items()}
    ratio = med["resized256"] / med["native400"]
    print(f"\nmedians over {ROUNDS} interleaved rounds "
          f"({ITERS}x B={BATCH} each):")
    for k, v in med.items():
        print(f"  {k}: {v:.1f} img/s  (all: "
              f"{[round(x, 1) for x in rates[k]]})")
    print(f"record_image_size=256 host-pipeline speedup: {ratio:.2f}x")


if __name__ == "__main__":
    main()
