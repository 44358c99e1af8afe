"""Tests for the Flax stacked hourglass model: exact Keras param-count
parity, output structure, mobile variant, and train/eval mode behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.models.hourglass import (
    StackedHourglass,
    create_hourglass_model,
)


def init_model(stacks=1, channels=64, mobile=False, size=64):
    m = StackedHourglass(num_stacks=stacks, num_channels=channels, mobile=mobile)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False)
    return m, v


def count(v):
    return sum(x.size for x in jax.tree.leaves(v))


@pytest.mark.parametrize("stacks,expected", [
    # Keras count_params of the reference model (trainable + BN moving stats).
    # 4-stack value is Train.ipynb cell 10's 13,784,260; note the reference's
    # Keras graph prunes the final stack's unused next-stage head convs.
    (1, 3_659_665),
    (2, 7_034_530),
    (4, 13_784_260),
])
def test_param_count_matches_keras(stacks, expected):
    m = StackedHourglass(num_stacks=stacks, num_channels=256)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False)
    assert count(v) == expected


def test_outputs_one_per_stack():
    m, v = init_model(stacks=3, channels=32)
    outs = m.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    assert isinstance(outs, list) and len(outs) == 3
    for o in outs:
        assert o.shape == (2, 16, 16, 17)
        assert o.dtype == jnp.float32


def test_sigmoid_head_range():
    m, v = init_model()
    outs = m.apply(v, jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)),
                   train=False)
    for o in outs:
        assert float(jnp.min(o)) >= 0.0
        assert float(jnp.max(o)) <= 1.0


def test_mobile_variant_builds_and_is_smaller():
    m, v = init_model(stacks=1, channels=64)
    mm, mv = init_model(stacks=1, channels=64, mobile=True)
    assert count(mv) < count(v)
    outs = mm.apply(mv, jnp.zeros((1, 64, 64, 3)), train=False)
    assert outs[0].shape == (1, 16, 16, 17)


def test_train_mode_updates_batch_stats():
    m, v = init_model()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    outs, mutated = m.apply(v, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed


def test_eval_mode_is_deterministic_and_pure():
    m, v = init_model()
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    o1 = m.apply(v, x, train=False)
    o2 = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))


def test_remat_matches_no_remat():
    m = StackedHourglass(num_stacks=2, num_channels=32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    mr = StackedHourglass(num_stacks=2, num_channels=32, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))
    o1 = m.apply(v, x, train=False)
    o2 = mr.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(o1[-1]), np.asarray(o2[-1]), atol=1e-6)


def test_factory_signature():
    m = create_hourglass_model(17, 2, 128, (256, 256, 3), "sigmoid", mobile=False)
    assert m.num_stacks == 2 and m.num_channels == 128


def test_jit_forward():
    m, v = init_model()
    fwd = jax.jit(lambda vv, x: m.apply(vv, x, train=False))
    outs = fwd(v, jnp.zeros((1, 64, 64, 3)))
    assert outs[0].shape == (1, 16, 16, 17)


def test_gradients_flow_to_all_stacks():
    """Intermediate supervision: every stack's params receive gradient."""
    m, v = init_model(stacks=2, channels=32)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 64, 3))
    y = jax.random.uniform(jax.random.PRNGKey(6), (1, 16, 16, 17))

    def loss_fn(params):
        outs, _ = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                          x, train=True, mutable=["batch_stats"])
        return sum(jnp.mean((o - y) ** 2) for o in outs)

    grads = jax.grad(loss_fn)(v["params"])
    for name in ("hg0_conv_1x1_predict", "hg1_conv_1x1_predict"):
        g = grads[name]["kernel"]
        assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("impl", ["taps", "dense"])
def test_mobile_depthwise_taps_matches_conv(impl):
    """The alternative depthwise lowerings are drop-ins for the grouped
    conv: identical parameter tree AND init values, and the same forward
    answer on one set of weights (checkpoints are interchangeable)."""
    kwargs = dict(num_stacks=2, num_channels=64, mobile=True)
    mc = StackedHourglass(**kwargs, mobile_depthwise="conv")
    mt = StackedHourglass(**kwargs, mobile_depthwise=impl)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    vc = mc.init(jax.random.PRNGKey(0), x, train=False)
    vt = mt.init(jax.random.PRNGKey(0), x, train=False)
    leaves_c, tree_c = jax.tree.flatten(vc)
    leaves_t, tree_t = jax.tree.flatten(vt)
    assert tree_c == tree_t
    for lc, lt in zip(leaves_c, leaves_t):
        np.testing.assert_array_equal(np.asarray(lc), np.asarray(lt))
    oc = mc.apply(vc, x, train=False)
    ot = mt.apply(vc, x, train=False)  # taps lowering on conv-init weights
    for a, b in zip(oc, ot):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("impl", ["taps", "dense"])
@pytest.mark.parametrize("kernel_size", [1, 3])
def test_mobile_depthwise_taps_grads_match_conv(kernel_size, impl):
    """The alternative lowerings train identically: input and parameter
    gradients match the grouped-conv formulation on the same weights (same
    function, so the same VJP — only the lowering differs; for 'dense' the
    eye-mask broadcast projects the dense-kernel gradient back onto the
    diagonal). Compared at the SeparableConv level, where the two are
    directly adjacent; the full-model check is the forward test above
    (train-mode BatchNorm's 1/sqrt(var) chains amplify benign
    summation-order noise)."""
    from single_person_pose_estimation_tpu.models.hourglass import (
        SeparableConv,
    )

    mc = SeparableConv(features=48, kernel_size=kernel_size,
                       depthwise_impl="conv")
    mt = SeparableConv(features=48, kernel_size=kernel_size,
                       depthwise_impl=impl)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 32))
    ct = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 16, 48))
    v = mc.init(jax.random.PRNGKey(0), x)

    def loss_fn(model, params, xx):
        return jnp.sum(model.apply({"params": params}, xx) * ct)

    gc = jax.grad(lambda p, xx: loss_fn(mc, p, xx), argnums=(0, 1))(
        v["params"], x)
    gt = jax.grad(lambda p, xx: loss_fn(mt, p, xx), argnums=(0, 1))(
        v["params"], x)
    leaves_c, tree_c = jax.tree.flatten(gc)
    leaves_t, tree_t = jax.tree.flatten(gt)
    assert tree_c == tree_t
    for lc, lt in zip(leaves_c, leaves_t):
        np.testing.assert_allclose(np.asarray(lc), np.asarray(lt),
                                   atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("impl", ["taps", "dense"])
def test_mobile_depthwise_taps_bf16(impl):
    """bf16 compute path of the alternative lowerings stays within the
    standard bf16 band of the f32 answer (same check 'conv' passes)."""
    m32 = StackedHourglass(num_stacks=1, num_channels=64, mobile=True,
                           mobile_depthwise=impl)
    mbf = StackedHourglass(num_stacks=1, num_channels=64, mobile=True,
                           mobile_depthwise=impl,
                           compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 64, 64, 3))
    v = m32.init(jax.random.PRNGKey(0), x, train=False)
    o32 = m32.apply(v, x, train=False)
    obf = mbf.apply(v, x, train=False)
    # Sigmoid heads in [0, 1]; bf16 rounding bounds the absolute error.
    np.testing.assert_allclose(np.asarray(o32[0]), np.asarray(obf[0]),
                               atol=3e-2)


def test_mobile_depthwise_invalid_value_raises():
    m = StackedHourglass(num_stacks=1, num_channels=32, mobile=True,
                         mobile_depthwise="bogus")
    with pytest.raises(ValueError, match="taps.*conv|depthwise_impl"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)


def test_invalid_input_size_clear_error():
    m = StackedHourglass(num_stacks=1, num_channels=16)
    with pytest.raises(ValueError, match="divisible by 64"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 100, 100, 3)),
               train=False)
    with pytest.raises(ValueError, match="divisible by 64"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)), train=False)
