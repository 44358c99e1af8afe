"""Per-level bottleneck fwd/bwd: pallas kernels vs XLA chain, chained
inside one jit at each hourglass level's real geometry (C=256, Cmid=128;
spatial 64..4). Decides the per-level backend split for fused_train."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu.experimental import bottleneck_grad as bg

B, C = 64, 256
CM = C // 2
dt = jnp.bfloat16
INNER = 8


def timed(name, fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    per = (time.perf_counter() - t0) / iters / INNER
    print(f"{name}: {per*1e3:.3f} ms/bneck", flush=True)
    return per


def make_args(H):
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(ks[0], (B, H, H, C), dt) * 0.5
    return dict(
        x=x,
        w1=jax.random.normal(ks[1], (C, CM)) * 0.05,
        b1=jax.random.normal(ks[2], (CM,)) * 0.05,
        w2=jax.random.normal(ks[3], (3, 3, CM, CM)) * 0.05,
        b2=jax.random.normal(ks[4], (CM,)) * 0.05,
        w3=jax.random.normal(ks[5], (CM, C)) * 0.05,
        b3=jax.random.normal(ks[6], (C,)) * 0.05,
        g1=jnp.ones((CM,)), be1=jnp.zeros((CM,)),
        g2=jnp.ones((CM,)), be2=jnp.zeros((CM,)),
        g3=jnp.ones((C,)), be3=jnp.zeros((C,)),
    )


ORDER = ("x", "w1", "b1", "w2", "b2", "w3", "b3",
         "g1", "be1", "g2", "be2", "g3", "be3")


def fwd_loop(fwd_impl, args):
    vals = [args[k] for k in ORDER]

    def body(i, x_):
        out, _, _ = fwd_impl(x_, *vals[1:])
        return (out * 0.3).astype(dt)
    return jax.lax.fori_loop(0, INNER, body, vals[0])


def fwdbwd_loop(backend, args):
    f = bg.make_bottleneck_train(backend)
    vals = [args[k] for k in ORDER]

    def one(x_):
        out, _ = f(x_, *vals[1:])
        return jnp.sum(out.astype(jnp.float32) * 1e-3)

    def body(i, carry):
        x_, acc = carry
        l, dx = jax.value_and_grad(one)(x_)
        return (x_ + dx.astype(dt) * 0.0).astype(dt), acc + l
    return jax.lax.fori_loop(0, INNER, body,
                             (vals[0], jnp.zeros((), jnp.float32)))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    for H in (64, 32, 16, 8, 4):
        args = make_args(H)
        if which == "fwd":
            timed(f"H{H:3d} fwd xla   ",
                  jax.jit(lambda a: fwd_loop(bg.bottleneck_train_fwd, a)),
                  args)
            timed(f"H{H:3d} fwd pallas",
                  jax.jit(lambda a: fwd_loop(
                      partial(bg.bottleneck_train_fwd_pallas), a)),
                  args)
        else:
            timed(f"H{H:3d} fwd+bwd jnp       ",
                  jax.jit(lambda a: fwdbwd_loop("jnp", a)), args)
            timed(f"H{H:3d} fwd+bwd pallas_bwd",
                  jax.jit(lambda a: fwdbwd_loop("pallas_bwd", a)), args)
            timed(f"H{H:3d} fwd+bwd pallas    ",
                  jax.jit(lambda a: fwdbwd_loop("pallas", a)), args)


if __name__ == "__main__":
    main()
