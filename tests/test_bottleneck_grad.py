"""Hand-fused bottleneck backward (ops/pallas/bottleneck_grad.py) vs jax
autodiff of the identical forward — the correctness anchor for the fused
training path."""

import jax
from functools import partial
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.experimental import bottleneck_grad as bg


def make_inputs(key, B=2, H=8, W=8, C=32, dtype=jnp.float32):
    ks = jax.random.split(key, 16)
    cmid = C // 2
    x = jax.random.normal(ks[0], (B, H, W, C), dtype) * 0.5
    args = dict(
        x=x,
        w1=jax.random.normal(ks[1], (C, cmid)) * 0.1,
        b1=jax.random.normal(ks[2], (cmid,)) * 0.1,
        w2=jax.random.normal(ks[3], (3, 3, cmid, cmid)) * 0.1,
        b2=jax.random.normal(ks[4], (cmid,)) * 0.1,
        w3=jax.random.normal(ks[5], (cmid, C)) * 0.1,
        b3=jax.random.normal(ks[6], (C,)) * 0.1,
        g1=1.0 + 0.1 * jax.random.normal(ks[7], (cmid,)),
        be1=0.1 * jax.random.normal(ks[8], (cmid,)),
        g2=1.0 + 0.1 * jax.random.normal(ks[9], (cmid,)),
        be2=0.1 * jax.random.normal(ks[10], (cmid,)),
        g3=1.0 + 0.1 * jax.random.normal(ks[11], (C,)),
        be3=0.1 * jax.random.normal(ks[12], (C,)),
    )
    cot = jax.random.normal(ks[13], (B, H, W, C), dtype)
    return args, cot


ORDER = ("x", "w1", "b1", "w2", "b2", "w3", "b3",
         "g1", "be1", "g2", "be2", "g3", "be3")


def _loss_auto(args, cot):
    """Autodiff baseline: same forward WITHOUT the custom vjp."""
    out, _, _ = bg.bottleneck_train_fwd(*[args[k] for k in ORDER])
    return jnp.sum(out.astype(jnp.float32) * cot.astype(jnp.float32))


def _loss_custom(args, cot):
    out, _ = bg.bottleneck_train(*[args[k] for k in ORDER])
    return jnp.sum(out.astype(jnp.float32) * cot.astype(jnp.float32))


@pytest.mark.parametrize("shape", [(2, 8, 8, 32), (1, 4, 12, 16)])
def test_custom_bwd_matches_autodiff_f32(shape):
    B, H, W, C = shape
    args, cot = make_inputs(jax.random.PRNGKey(0), B, H, W, C)
    auto = jax.jit(jax.grad(_loss_auto))(args, cot)
    custom = jax.jit(jax.grad(_loss_custom))(args, cot)
    for k in ORDER:
        np.testing.assert_allclose(
            np.asarray(custom[k]), np.asarray(auto[k]),
            atol=2e-4, rtol=2e-4, err_msg=f"grad mismatch for {k}")


def test_forward_and_stats_match_flax_bn_semantics():
    """The fwd's BN must be flax-identical: f32 fast-variance stats with
    the zero clamp, normalize in f32, cast back."""
    import flax.linen as nn

    args, _ = make_inputs(jax.random.PRNGKey(1))
    a = jnp.maximum(bg._conv1x1(args["x"], args["w1"], args["b1"]), 0)
    mu, var = bg._bn_stats(a)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.99,
                      epsilon=1e-3)
    variables = bn.init(jax.random.PRNGKey(0), a)
    variables = {
        "params": {"scale": args["g1"], "bias": args["be1"]},
        "batch_stats": variables["batch_stats"],
    }
    want, mut = bn.apply(variables, a, mutable=["batch_stats"])
    got = bg._bn_apply(a, mu, var, args["g1"], args["be1"], a.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
    # Running-average update: ra = m*ra + (1-m)*batch_stat.
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        np.asarray(0.99 * variables["batch_stats"]["mean"] + 0.01 * mu),
        atol=1e-6)


def test_pallas_fwd_matches_jnp_f32():
    """Pallas forward kernels (interpret mode) vs the plain-lax forward:
    output, batch stats, and residuals."""
    args, _ = make_inputs(jax.random.PRNGKey(3), B=2, H=8, W=8, C=32)
    vals = [args[k] for k in ORDER]
    out_j, stats_j, res_j = jax.jit(bg.bottleneck_train_fwd)(*vals)
    fwd_p = jax.jit(partial(bg.bottleneck_train_fwd_pallas, interpret=True))
    out_p, stats_p, res_p = fwd_p(*vals)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j),
                               atol=1e-5, rtol=1e-5)
    for i, (sp, sj) in enumerate(zip(stats_p, stats_j)):
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sj),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"stats[{i}]")
    for i, (rp, rj) in enumerate(zip(res_p, res_j)):
        np.testing.assert_allclose(np.asarray(rp), np.asarray(rj),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"residual[{i}]")


@pytest.mark.parametrize("backend", ["pallas", "pallas_fwd", "pallas_bwd"])
def test_pallas_backend_grads_match_autodiff_f32(backend):
    """Grads through every pallas fwd/bwd combination vs jax autodiff of
    the plain forward (residuals differ only by kernel rounding)."""
    args, cot = make_inputs(jax.random.PRNGKey(4), B=2, H=8, W=8, C=32)
    f = bg.make_bottleneck_train(backend, interpret=True)

    def loss_p(a, c):
        out, _ = f(*[a[k] for k in ORDER])
        return jnp.sum(out.astype(jnp.float32) * c.astype(jnp.float32))

    auto = jax.jit(jax.grad(_loss_auto))(args, cot)
    custom = jax.jit(jax.grad(loss_p))(args, cot)
    for k in ORDER:
        np.testing.assert_allclose(
            np.asarray(custom[k]), np.asarray(auto[k]),
            atol=5e-4, rtol=5e-4, err_msg=f"grad mismatch for {k}")


def test_pallas_bwd_multiblock_grid():
    """Pallas bwd with batch > block size: dW/db/reduction accumulation
    across sequential grid steps must match the plain bwd."""
    args, cot = make_inputs(jax.random.PRNGKey(8), B=4, H=4, W=4, C=32)
    vals = [args[k] for k in ORDER]
    out, stats, res_core = bg.bottleneck_train_fwd(*vals)
    res = (*res_core, *stats, args["w1"], args["w2"], args["w3"],
           args["g1"], args["be1"], args["g2"], args["be2"],
           args["g3"], args["be3"])
    want = bg.bottleneck_train_bwd(res, cot)
    from single_person_pose_estimation_tpu.experimental import (
        bottleneck_train_kernel as ker,
    )
    orig = ker.resolve_nimg
    ker.resolve_nimg = lambda *a, **k: 1  # force 4 grid steps
    try:
        got = bg.bottleneck_train_bwd_pallas(res, cot, interpret=True)
    finally:
        ker.resolve_nimg = orig
    for i, (gv, wv) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(gv, np.float32), np.asarray(wv, np.float32),
            atol=5e-4, rtol=5e-4, err_msg=f"bwd output {i}")


def test_pallas_fwd_multiblock_grid():
    """Batch larger than the per-step block: the stat accumulation across
    sequential grid steps must equal the single-pass stats."""
    from single_person_pose_estimation_tpu.experimental import (
        bottleneck_train_kernel as ker,
    )

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (4, 4, 4, 32))
    w = jax.random.normal(jax.random.PRNGKey(6), (32, 16)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(7), (16,)) * 0.1
    a, sums = ker.conv1x1_relu_stats(x, w, b, interpret=True, nimg=1)
    want = jnp.maximum(jnp.dot(x, w) + b, 0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums[0]),
                               np.asarray(want.sum((0, 1, 2))), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sums[1]),
                               np.asarray((want * want).sum((0, 1, 2))),
                               rtol=1e-5)


def test_custom_bwd_bf16_close():
    """bf16 guard against gross errors (sign flips / wrong shifts would be
    O(1) relative). The baseline autodiff accumulates dW in bf16 while the
    custom bwd accumulates in f32 — the ~6% worst-element gap observed is
    the BASELINE's rounding, which the exact-f32 test above rules out as a
    custom-bwd defect."""
    args, cot = make_inputs(jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    auto = jax.jit(jax.grad(_loss_auto))(args, cot)
    custom = jax.jit(jax.grad(_loss_custom))(args, cot)
    for k in ("w1", "w2", "w3", "g1", "g3"):
        a, c = np.asarray(auto[k], np.float32), np.asarray(custom[k],
                                                           np.float32)
        denom = np.maximum(np.abs(a).max(), 1e-3)
        assert np.abs(a - c).max() / denom < 0.15, k
