"""Space-to-depth front fold (ops/space_to_depth.py): exact equivalence
with the reference 7x7/s2 SAME conv (reference model/hourglass.py:54-58),
through the flax model flag and the fused path flag, values AND grads."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from single_person_pose_estimation_tpu.ops.space_to_depth import (
    fold_front_kernel,
    front_conv_s2d,
    space_to_depth,
)


def _ref_conv(x, kernel, bias):
    return lax.conv_general_dilated(
        x, kernel, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias


def test_space_to_depth_layout():
    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    y = space_to_depth(x)
    assert y.shape == (2, 2, 3, 12)
    # channel index (d1, d2, c): y[..., d1*6 + d2*3 + c] == x[2i+d1, 2j+d2, c]
    np.testing.assert_array_equal(np.asarray(y[0, 1, 2, 3 + 2]),
                                  np.asarray(x[0, 2, 5, 2]))
    np.testing.assert_array_equal(np.asarray(y[1, 0, 0, 6 + 1]),
                                  np.asarray(x[1, 1, 0, 1]))


def test_fold_kernel_shape_and_taps():
    k = jax.random.normal(jax.random.PRNGKey(0), (7, 7, 3, 64))
    k2 = fold_front_kernel(k)
    assert k2.shape == (4, 4, 12, 64)
    # Tap (a=0, d1=1) maps to original row i = 2*0 + 1 = 1 etc.
    np.testing.assert_array_equal(
        np.asarray(k2.reshape(4, 4, 2, 2, 3, 64)[1, 2, 0, 1]),
        np.asarray(k[2, 5]))


def test_front_conv_s2d_equals_strided_conv():
    rng = jax.random.PRNGKey(1)
    for shape in ((2, 256, 256, 3), (1, 64, 64, 3), (3, 64, 128, 3)):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        x = jax.random.uniform(k1, shape)
        kern = jax.random.normal(k2, (7, 7, 3, 64)) * 0.1
        bias = jax.random.normal(k3, (64,)) * 0.1
        got = front_conv_s2d(x, kern, bias)
        want = _ref_conv(x, kern, bias)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_front_conv_s2d_grads_match():
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    kern = jax.random.normal(jax.random.PRNGKey(3), (7, 7, 3, 64)) * 0.1
    bias = jnp.zeros((64,))

    g1 = jax.grad(lambda k: jnp.sum(front_conv_s2d(x, k, bias) ** 2))(kern)
    g2 = jax.grad(lambda k: jnp.sum(_ref_conv(x, k, bias) ** 2))(kern)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3,
                               rtol=1e-4)


def test_model_front_s2d_flag_same_params_same_outputs():
    """front_s2d=True is a drop-in: identical param tree (checkpoints
    interchange) and identical outputs from the same variables."""
    from single_person_pose_estimation_tpu.models.hourglass import (
        StackedHourglass,
    )

    base = StackedHourglass(num_stacks=1, num_channels=16)
    s2d = StackedHourglass(num_stacks=1, num_channels=16, front_s2d=True)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    v = base.init(jax.random.PRNGKey(0), x, train=False)
    v2 = s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        assert a.shape == b.shape
    want = base.apply(v, x, train=False)
    got = s2d.apply(v, x, train=False)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # Train-mode gradients agree too (the fold is differentiable).
    def loss(m):
        def f(p):
            out = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                          x, train=False)
            return sum(jnp.sum(o ** 2) for o in out)
        return jax.grad(f)(v["params"])
    g1 = loss(base)
    g2 = loss(s2d)
    gk1 = g1["front_conv_1x1_1"]["kernel"]
    gk2 = g2["front_conv_1x1_1"]["kernel"]
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               atol=1e-3, rtol=1e-3)


def test_fused_apply_front_s2d_flag():
    from single_person_pose_estimation_tpu.models.fused_inference import (
        fused_apply,
    )
    from single_person_pose_estimation_tpu.models.hourglass import (
        StackedHourglass,
    )
    from tests.test_fused_inference import randomized_variables

    model = StackedHourglass(num_stacks=1, num_channels=16,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=1, compute_dtype=jnp.float32,
                      interpret=True, front_s2d=True)
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]),
                               atol=1e-4)
