"""Jitted train/eval steps with fused on-device preprocessing.

TPU-native redesign of the reference's Keras `fit` step (trainer.py:49-56):
instead of a host-side tf.data pipeline feeding the accelerator, the *whole*
per-step pipeline — geometric+photometric augmentation, Gaussian heatmap
target rendering, forward, loss, backward, Adam update — is one XLA program
with donated state. Batches arrive as raw decoded crops + keypoints; the
device does the rest.

Data parallelism: `make_train_step(..., mesh=...)` returns a jit with
NamedSharding constraints — state replicated, batch sharded over the
"data" axis. GSPMD inserts the gradient all-reduce (and the cross-replica
BatchNorm mean, i.e. sync-BN) over ICI automatically; there is no explicit
pmap/psum plumbing to maintain.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from single_person_pose_estimation_tpu import losses as losses_lib
from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.ops.augment import augment_batch
from single_person_pose_estimation_tpu.ops.heatmap import render_heatmaps_batch
from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib


class TrainState(struct.PyTreeNode):
    """Model + optimizer state. A pure pytree: jit/donate/checkpoint friendly.

    Unlike the reference (which checkpoints weights only and silently resets
    Adam moments on every resume — trainer.py:85-90), opt_state is part of
    the state and survives checkpoint/resume.
    """

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, model, tx, rng, input_shape=(1, 256, 256, 3)):
        init_rng, state_rng = jax.random.split(rng)
        variables = model.init(init_rng, jnp.zeros(input_shape, jnp.float32),
                               train=False)
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(params),
            rng=state_rng,
        )


def _forward_loss(model, loss_fn, params, batch_stats, images, heatmaps,
                  model_backend: str = "flax", bn_mode: str = "batch"):
    if bn_mode == "frozen":
        # Eval-mode BN: normalize with the RUNNING statistics and leave
        # them untouched — the standard fine-tuning / post-warmup recipe
        # (stable small-batch training; also skips the batch-stat
        # reductions). Params still train.
        outs = model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False)
        per_stack = losses_lib.per_stack_losses(loss_fn, heatmaps, outs)
        total = jnp.sum(jnp.stack(per_stack))
        return total, (batch_stats, per_stack)
    if model_backend == "fused":
        from single_person_pose_estimation_tpu.experimental.fused_train import (
            fused_train_apply,
        )
        outs, new_stats = fused_train_apply(
            {"params": params, "batch_stats": batch_stats}, images,
            num_stacks=model.num_stacks,
            compute_dtype=model.compute_dtype,
            bn_momentum=model.bn_momentum)
    else:
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    per_stack = losses_lib.per_stack_losses(loss_fn, heatmaps, outs)
    total = jnp.sum(jnp.stack(per_stack))
    return total, (new_stats, per_stack)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    config: Config,
    mesh: Optional[Mesh] = None,
    augment: bool = True,
    model_axis: Optional[str] = None,
    example_state: Optional["TrainState"] = None,
    model_backend: str = "flax",
    bn_mode: str = "batch",
    compiler_options: Optional[Dict[str, Any]] = None,
    accum_steps: int = 1,
):
    """Build the jitted train step.

    accum_steps: gradient accumulation. With accum_steps=N the batch is
    split into N equal microbatches, the forward/backward runs over them
    as a `lax.scan` (so peak ACTIVATION memory scales with the microbatch,
    the standard large-effective-batch recipe on memory-bound configs like
    S8 or 512² inputs), gradients are averaged, and ONE optimizer update
    is applied — the loss/grad of the full batch exactly, for the
    mean-over-batch losses this framework uses, whenever BN does not
    couple examples (bn_mode='frozen'; pinned by test). With train-mode BN
    ('batch') each microbatch normalizes by its OWN statistics and the
    running stats chain through the N microbatches in order — the same
    semantics as N sequential steps of a frozen optimizer, NOT identical
    to one big-batch step (smaller effective BN batch; document-by-design,
    same trade PyTorch users make). Augmentation and target rendering run
    once on the full batch, so data semantics are unchanged. The reference
    has no equivalent (Keras fit, fixed batch 16 — trainer.py:49).

    compiler_options: optional XLA option overrides forwarded to jax.jit
    (e.g. {"xla_tpu_scoped_vmem_limit_kib": "65536"}) — an experiment
    dial; the measured A/B on v5e is in PERF.md (scripts/
    bench_xla_flags_ab.py). Defaults win; leave unset in production.

    model_backend: "flax" (nn.Module.apply + XLA autodiff) or "fused"
    (models.fused_train.fused_train_apply — hand-fused bottleneck
    backward; non-mobile hourglass only, equality-tested against the flax
    path in tests/test_fused_train.py).

    bn_mode: "batch" (train-mode BN, reference semantics) or "frozen"
    (normalize with the running statistics and do not update them — the
    standard fine-tuning recipe after BN has converged; measured 4.2%
    faster fwd+bwd on v5e, 508 vs 487 img/s at S4/256 B=64, since the
    batch-stat reductions and their backward vanish).

    The step signature is (state, batch) -> (state, metrics) where batch is
    a dict with:
      "image": (B, H, W, 3) float32 in [0, 1]
      "kx", "ky": (B, K) float32 keypoints in heatmap (64x64) space
      "kv": (B, K) int32 visibility
    Metrics: {"loss": scalar, "loss/hg{i}": scalar per stack} — the same
    per-stack breakdown Keras logs for the reference (Train.ipynb cell 20).
    """
    if model_backend == "fused" and getattr(model, "mobile", False):
        raise ValueError(
            "model_backend='fused' supports the non-mobile hourglass only")
    if bn_mode not in ("batch", "frozen"):
        raise ValueError(f"bn_mode must be 'batch' or 'frozen': {bn_mode!r}")
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1: {accum_steps}")
    flip_pairs = config.flip_pairs
    label_h, label_w = config.label_height, config.label_width
    sigma = config.hm_sigma
    geo_backend = config.augment_backend
    if geo_backend == "auto":
        # The gather-free matmul warp is ~5x faster on TPU; gathers are
        # fine on CPU/GPU (and exact).
        geo_backend = ("matmul2pass" if jax.default_backend() == "tpu"
                       else "gather")

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, next_rng = jax.random.split(state.rng)
        images = batch["image"]
        if images.dtype == jnp.uint8:
            # uint8 wire (config.train_transfer_dtype): 4x less host->device
            # traffic; normalize on device instead of on the host.
            images = images.astype(jnp.float32) / 255.0
        kx, ky, kv = batch["kx"], batch["ky"], batch["kv"]
        if augment:
            images, kx, ky, kv = augment_batch(
                rng, images, kx, ky, kv,
                label_size=label_w, flip_pairs=flip_pairs,
                geometric_backend=geo_backend,
                scale_min=config.aug_scale_min,
                scale_max=config.aug_scale_max,
                rotate_deg=config.aug_rotate_deg)
        heatmaps = render_heatmaps_batch(
            kx, ky, kv, height=label_h, width=label_w, sigma=sigma)

        if accum_steps > 1:
            b = images.shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch size {b} not divisible by accum_steps "
                    f"{accum_steps}")
            micro = b // accum_steps
            imgs_s = images.reshape((accum_steps, micro) + images.shape[1:])
            hms_s = heatmaps.reshape(
                (accum_steps, micro) + heatmaps.shape[1:])

            def micro_step(carry, xs):
                g_acc, stats = carry
                imgs_m, hms_m = xs
                grad_fn = jax.value_and_grad(
                    lambda p: _forward_loss(model, loss_fn, p, stats,
                                            imgs_m, hms_m,
                                            model_backend=model_backend,
                                            bn_mode=bn_mode),
                    has_aux=True)
                (tot_m, (stats, ps_m)), g_m = grad_fn(state.params)
                g_acc = jax.tree.map(jnp.add, g_acc, g_m)
                return (g_acc, stats), (tot_m, jnp.stack(ps_m))

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, new_stats), (totals, ps_all) = jax.lax.scan(
                micro_step, (g0, state.batch_stats), (imgs_s, hms_s))
            grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
            total = jnp.mean(totals)
            per_stack = list(jnp.mean(ps_all, axis=0))
        else:
            grad_fn = jax.value_and_grad(
                lambda p: _forward_loss(model, loss_fn, p, state.batch_stats,
                                        images, heatmaps,
                                        model_backend=model_backend,
                                        bn_mode=bn_mode),
                has_aux=True)
            (total, (new_stats, per_stack)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            rng=next_rng,
        )
        metrics = {"loss": total}
        for i, l in enumerate(per_stack):
            metrics[f"loss/hg{i}"] = l
        return new_state, metrics

    if mesh is not None:
        repl = mesh_lib.replicated(mesh)
        data = mesh_lib.batch_sharding(mesh)
        if model_axis is not None:
            # Tensor-parallel state shardings need the concrete state tree.
            from single_person_pose_estimation_tpu.parallel import (
                sharding_rules,
            )
            if example_state is None:
                raise ValueError(
                    "model_axis sharding requires example_state to derive "
                    "the per-leaf PartitionSpecs")
            state_sh = sharding_rules.state_shardings(example_state, mesh,
                                                      model_axis)
        else:
            state_sh = jax.tree.map(lambda _: repl, example_state) \
                if example_state is not None else repl
        return jax.jit(
            step,
            in_shardings=(state_sh, data),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,),
            compiler_options=compiler_options,
        )
    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=compiler_options)


def make_eval_step(
    model,
    loss_fn: Callable,
    config: Config,
    mesh: Optional[Mesh] = None,
    model_axis: Optional[str] = None,
    example_state: Optional["TrainState"] = None,
):
    """Validation step: heatmap render (no augmentation, reference
    make_valid_label semantics — dataset_builder.py:82-86), forward with
    running BN statistics, per-stack losses."""
    label_h, label_w = config.label_height, config.label_width
    sigma = config.hm_sigma

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        heatmaps = render_heatmaps_batch(
            batch["kx"], batch["ky"], batch["kv"],
            height=label_h, width=label_w, sigma=sigma)
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False)
        per_stack = losses_lib.per_stack_losses(loss_fn, heatmaps, outs)
        metrics = {"loss": jnp.sum(jnp.stack(per_stack))}
        for i, l in enumerate(per_stack):
            metrics[f"loss/hg{i}"] = l
        return metrics

    if mesh is not None:
        repl = mesh_lib.replicated(mesh)
        data = mesh_lib.batch_sharding(mesh)
        if model_axis is not None and example_state is not None:
            from single_person_pose_estimation_tpu.parallel import (
                sharding_rules,
            )
            state_sh = sharding_rules.state_shardings(example_state, mesh,
                                                      model_axis)
        else:
            state_sh = repl
        return jax.jit(step, in_shardings=(state_sh, data),
                       out_shardings=repl)
    return jax.jit(step)


def make_predict_fn(model, mesh: Optional[Mesh] = None):
    """Batched inference returning the LAST stack's heatmaps only
    (the reference's eval convention, eval.py:108)."""

    def predict(params, batch_stats, images):
        outs = model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False)
        return outs[-1]

    if mesh is not None:
        repl = mesh_lib.replicated(mesh)
        data = mesh_lib.batch_sharding(mesh)
        return jax.jit(predict, in_shardings=(repl, repl, data),
                       out_shardings=data)
    return jax.jit(predict)


def make_lr_schedule(learning_rate: float, schedule: Optional[str] = None,
                     total_steps: Optional[int] = None,
                     warmup_steps: int = 0):
    """An optax learning-rate schedule.

    schedule=None/'constant' is the reference semantics (fixed lr per
    session, trainer.py:31; resume_training sets a new constant).
    'cosine' decays to 0 over total_steps after warmup_steps of linear
    warmup — the standard from-scratch TPU recipe the reference lacked
    (it trained in fixed-lr sessions, dropping lr by hand between
    Train.ipynb runs)."""
    if schedule in (None, "constant"):
        if warmup_steps:
            return optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return learning_rate
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("schedule='cosine' requires total_steps")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=total_steps)
    raise ValueError(
        f"unknown schedule {schedule!r}: use None/'constant'/'cosine'")


def ema_of_params(decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the PARAMS inside opt_state.

    A stateful identity transform: updates pass through unchanged; the
    state holds ema <- decay * ema + (1 - decay) * new_params after each
    step. Living in opt_state, the EMA checkpoints/restores/shards with
    everything else for free (training/checkpoint.py). Retrieve with
    `get_ema_params(state.opt_state)` and evaluate by swapping params —
    the standard Polyak-averaged eval for heatmap models."""
    if not 0.0 <= decay < 1.0:
        raise ValueError(f"ema decay must be in [0, 1): {decay}")

    def init(params):
        # A REAL copy: jnp.asarray would alias the param buffers, and a
        # donated train step then sees the same buffer twice (Execute()
        # "donate the same buffer twice" error).
        return {"ema": jax.tree.map(lambda p: jnp.array(p, copy=True),
                                    params)}

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("ema_of_params needs params passed to update")
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: e * decay + (1.0 - decay) * p,
                           state["ema"], new_p)
        return updates, {"ema": ema}

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """The EMA param tree tracked by make_optimizer(ema_decay=...)."""
    leaves = opt_state if isinstance(opt_state, (tuple, list)) \
        else (opt_state,)
    for s in leaves:
        if isinstance(s, dict) and "ema" in s:
            return s["ema"]
    raise ValueError(
        "optimizer state has no EMA component; build it with "
        "make_optimizer(..., ema_decay=0.999)")


def make_optimizer(learning_rate: float, schedule: Optional[str] = None,
                   total_steps: Optional[int] = None, warmup_steps: int = 0,
                   ema_decay: Optional[float] = None,
                   ) -> optax.GradientTransformation:
    """Adam with Keras defaults (b1=0.9, b2=0.999, eps=1e-7), matching the
    reference optimizer (trainer.py:31). Optional extras beyond the
    reference: an lr schedule (see make_lr_schedule) and a Polyak EMA of
    the params (see ema_of_params)."""
    lr = make_lr_schedule(learning_rate, schedule, total_steps, warmup_steps)
    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-7)
    if ema_decay is not None:
        tx = optax.chain(tx, ema_of_params(ema_decay))
    return tx


def recalibrate_batch_stats(model, state: TrainState, batches,
                            momentum: float = 0.0) -> TrainState:
    """Refresh BatchNorm running statistics by forwarding `batches` in
    train mode WITHOUT touching params (standard BN recalibration).

    With the Keras-default momentum of 0.99 the running stats need tens of
    thousands of steps to converge; after short trainings (or weight
    import) eval-mode outputs can be far off batch-stat outputs. With
    momentum=0.0 a single pass adopts each batch's statistics outright
    (exact for a one-batch dataset; for streams, pass a larger momentum
    like 0.9 and several batches).
    """
    recal_model = model.clone(bn_momentum=momentum)

    @jax.jit
    def one(stats, images):
        _, mut = recal_model.apply(
            {"params": state.params, "batch_stats": stats},
            images, train=True, mutable=["batch_stats"])
        return mut["batch_stats"]

    stats = state.batch_stats
    for batch in batches:
        images = batch["image"] if isinstance(batch, dict) else batch
        stats = one(stats, images)
    return state.replace(batch_stats=stats)
