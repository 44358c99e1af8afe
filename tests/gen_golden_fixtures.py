"""Generate golden parity fixtures from the reference model source.

Runs the reference's create_hourglass_model (/root/reference/model/
hourglass.py:5) with deterministic weights, records its per-stack heatmap
outputs on fixed inputs plus the imported flax variables, and writes one
.npz per case into tests/fixtures/. tests/test_golden_fixtures.py then
regression-checks numeric parity WITHOUT TensorFlow installed
(VERDICT.md Next #9).

Usage: python tests/gen_golden_fixtures.py   (requires TF + the reference
checkout; only needed to regenerate the committed fixtures)
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FIXTURES = os.path.join(HERE, "fixtures")

sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

CASES = [
    # name, num_stacks, num_channels, input_size, mobile, seed
    ("golden_ref_s2c32", 2, 32, 64, False, 7),
    ("golden_ref_s1c32_mobile", 1, 32, 64, True, 8),
]


def flatten_variables(variables):
    from flax.traverse_util import flatten_dict

    return {
        "var/" + "/".join(k): np.asarray(v)
        for k, v in flatten_dict(variables).items()
    }


def main():
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import keras.backend as K

    if not hasattr(K, "int_shape"):
        K.int_shape = lambda x: tuple(x.shape)
    sys.path.insert(0, "/root/reference")
    from model.hourglass import create_hourglass_model

    from keras_oracle import randomize_keras_weights_scaled
    from single_person_pose_estimation_tpu.utils import weight_import

    os.makedirs(FIXTURES, exist_ok=True)
    for name, stacks, channels, size, mobile, seed in CASES:
        ref = create_hourglass_model(
            17, stacks, channels, input_shape=(size, size, 3),
            predict_activation="sigmoid", mobile=mobile)
        randomize_keras_weights_scaled(ref, seed=seed)
        variables = weight_import.keras_to_flax_variables(ref)

        rng = np.random.default_rng(seed + 1)
        x = rng.uniform(0, 1, (2, size, size, 3)).astype(np.float32)
        outs = ref.predict(x, verbose=0)
        if stacks == 1:
            outs = [outs]

        payload = flatten_variables(variables)
        payload["x"] = x
        payload["meta"] = np.array([stacks, channels, size, int(mobile)])
        for i, o in enumerate(outs):
            payload[f"ref_out_{i}"] = np.asarray(o)
        path = os.path.join(FIXTURES, name + ".npz")
        np.savez_compressed(path, **payload)
        print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, "
              f"{stacks} stacks, {channels} ch, {size}px, mobile={mobile})")


if __name__ == "__main__":
    main()
