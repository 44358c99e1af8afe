"""Pipeline parallelism over hourglass stacks (GPipe schedule on a "pipe"
mesh axis).

The reference has no distributed machinery at all; SURVEY.md §2 notes the
stack chain is a natural pipeline (stack i feeds stack i+1 through the
inter-stack residual, reference model/hourglass.py:91) but leaves it as an
extension. This module is that extension, built the TPU way: the per-stack
parameters are stacked along a leading axis and sharded over a `pipe` mesh
axis, each pipeline stage runs its stacks with a `lax.scan`, and activations
hop stage-to-stage with `lax.ppermute` over ICI inside a `shard_map`. No
hand-written send/recv; differentiable end to end (ppermute transposes to
the inverse permutation, so `jax.grad` through the whole pipeline works).

Schedule: classic GPipe. With P stages and M microbatches the loop runs
M + P - 1 ticks; at tick t stage p computes microbatch t - p (masked out
during fill/drain). Bubble fraction = (P-1)/(M+P-1); pick M >= 4*P to keep
it small.

Composition with data parallelism: the batch dimension may additionally be
sharded over a `data` axis of the same mesh — activations then ride both
axes (dp x pp), and gradient all-reduce over `data` is inserted by GSPMD
outside the shard_map as usual.

Interface contract mirrors the sequential model exactly in eval mode:
`pipeline_forward(...)` equals `model.apply(...)[last]` (tested to 1e-5 in
tests/test_pipeline.py). In train mode BatchNorm uses per-microbatch batch
statistics — the standard PP semantics (each microbatch normalizes with its
own moments) — and make_pipeline_train_step CARRIES the running statistics:
front stats EMA-update with full-batch moments once per step, stacked stats
once per valid microbatch tick inside the GPipe scan, so eval after
pipelined training uses trained stats. recalibrate_pipeline_batch_stats
offers the same post-hoc refresh as the sequential trainer's
training.steps.recalibrate_batch_stats.

The true last stack's pruned next-stage head convs (reference
hourglass.py:71-93; pruned per Train.ipynb's 13,784,260 param count) are
zero-padded so every stage runs the same program; the zero convs make the
dead inter-stack output `x + 0 + 0`, which the schedule discards.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass


class HourglassFront(StackedHourglass):
    """Front module only (256^2 -> 64^2 x C). Param names match the full
    model's `front_*` keys, so split front variables apply directly."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return self._front(x.astype(self.compute_dtype), train)


class HourglassStage(StackedHourglass):
    """One hourglass stack with the canonical `hg0_*` param names.

    Always computes the inter-stack interface (is_last=False), so every
    pipeline stage runs one identical program regardless of position.
    Returns (next_x, head_predict)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return self._hourglass_module(x, 0, train, is_last=False)


def _strip_prefix(tree: Dict[str, Any], prefix: str,
                  rename: str = "") -> Dict[str, Any]:
    return {rename + k[len(prefix):]: v
            for k, v in tree.items() if k.startswith(prefix)}


def split_pipeline_variables(variables: Dict[str, Any], num_stacks: int,
                             ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split full-model variables into (front_vars, stacked_stage_vars).

    front_vars: the `front_*` subtree, usable with HourglassFront as-is.
    stacked_stage_vars: every per-stack leaf stacked on a new leading axis
    of length num_stacks, keys canonicalized to `hg0_*` (HourglassStage's
    names). The last stack's pruned `conv_1x1_2`/`conv_1x1_3` params are
    zero-filled so all stacks share one tree structure.
    """
    front = {col: _strip_prefix(tree, "front_", "front_")
             for col, tree in variables.items()}
    stacks = []
    for i in range(num_stacks):
        stacks.append({col: _strip_prefix(tree, f"hg{i}_", "hg0_")
                       for col, tree in variables.items()})
    # Zero-pad the pruned next-stage head convs (plain convs, no BN).
    params0 = stacks[0]["params"]
    c = params0["hg0_conv_1x1_1"]["kernel"].shape[-1]
    k = params0["hg0_conv_1x1_predict"]["kernel"].shape[-1]
    templates = {
        "hg0_conv_1x1_2": {"kernel": jnp.zeros((1, 1, c, c)),
                           "bias": jnp.zeros((c,))},
        "hg0_conv_1x1_3": {"kernel": jnp.zeros((1, 1, k, c)),
                           "bias": jnp.zeros((c,))},
    }
    for s in stacks:
        for name, tmpl in templates.items():
            if name not in s["params"]:
                s["params"][name] = jax.tree.map(jnp.zeros_like, tmpl)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stacks)
    return front, stacked


def merge_pipeline_variables(front: Dict[str, Any], stacked: Dict[str, Any],
                             num_stacks: int) -> Dict[str, Any]:
    """Inverse of split_pipeline_variables: reassemble full-model variables.

    Un-stacks each leaf, restores the `hg{i}_*` names, and drops the
    zero-padded pruned head convs from the last stack, so the result loads
    into StackedHourglass / Orbax checkpoints unchanged.
    """
    out = {col: dict(_strip_prefix(tree, "front_", "front_"))
           for col, tree in front.items()}
    for col in stacked:
        out.setdefault(col, {})
        for name, sub in stacked[col].items():
            for i in range(num_stacks):
                if (i == num_stacks - 1 and col == "params"
                        and name in ("hg0_conv_1x1_2", "hg0_conv_1x1_3")):
                    continue  # pruned on the true last stack
                out[col][f"hg{i}" + name[len("hg0"):]] = jax.tree.map(
                    lambda l: l[i], sub)
    return out


def _stage_modules(model: StackedHourglass):
    kwargs = dict(num_classes=model.num_classes,
                  num_channels=model.num_channels,
                  predict_activation=model.predict_activation,
                  mobile=model.mobile,
                  compute_dtype=model.compute_dtype,
                  bn_momentum=model.bn_momentum)
    return HourglassFront(**kwargs), HourglassStage(**kwargs)


def _stage_apply(stage: HourglassStage, svars, x, train: bool):
    if train:
        (nx, head), mut = stage.apply(svars, x, True,
                                      mutable=["batch_stats"])
        return nx, head.astype(jnp.float32), mut["batch_stats"]
    nx, head = stage.apply(svars, x, False)
    return nx, head.astype(jnp.float32), None


def _pipeline_engine(
    stage: HourglassStage,
    mesh: Mesh,
    pipe_axis: str,
    train: bool,
    loss_fn: Optional[Callable] = None,
    carry_stats: bool = False,
):
    """shard_map'd GPipe loop. Returns fn(stacked_vars, x0_mb[, targets_mb]).

    In predict mode (loss_fn None) returns the last stack's heatmaps
    (M, mb, h, w, K), replicated over `pipe`. In loss mode returns
    (total_loss_scalar, per_stack_losses[num_stacks]) averaged over
    microbatches, matching losses.per_stack_losses + sum semantics; with
    carry_stats=True it additionally returns the updated BatchNorm running
    statistics (EMA with the model's bn_momentum applied once per VALID
    microbatch tick — i.e. standard per-microbatch BN semantics, as if
    training sequentially at the microbatch size)."""
    n_stages = int(mesh.shape[pipe_axis])
    other_axes = [a for a in mesh.axis_names if a != pipe_axis]
    # Batch dims may ride other mesh axes (dp x pp): spell them out so the
    # microbatch dim stays unsharded and the batch dim keeps its data axis.
    data_axis = other_axes[0] if other_axes else None
    act_spec = P(None, data_axis)  # (M, mb, h, w, C)
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    # With carry_stats the stage runs at bn_momentum=0 so the flax BN
    # mutation returns the RAW batch moments of each microbatch; the EMA
    # with the model's momentum is applied explicitly in the scan carry
    # (masked on valid ticks only — fill/drain ticks must not decay stats).
    mom = float(stage.bn_momentum)
    run_stage = stage.clone(bn_momentum=0.0) if carry_stats else stage

    def device_fn(stacked_local, x0_mb, targets_mb):
        p = jax.lax.axis_index(pipe_axis)
        M = x0_mb.shape[0]
        k_local = jax.tree.leaves(stacked_local)[0].shape[0]

        def stack_body(x, svars):
            nx, head, moments = _stage_apply(run_stage, svars, x, train)
            return nx, (head, moments)

        # Only one accumulator is live per mode; the other stays a scalar so
        # the scan carry doesn't haul a dead (M, mb, h, w, K) buffer around.
        pred_acc = (jnp.zeros(x0_mb.shape[:-1] + (targets_mb.shape[-1],),
                              jnp.float32)
                    if loss_fn is None else jnp.zeros(()))
        loss_acc = jnp.zeros((k_local,), jnp.float32)

        stats0 = (stacked_local["batch_stats"] if carry_stats
                  else jnp.zeros(()))

        def tick(carry, t):
            buf, preds, lacc, stats = carry
            m = jnp.clip(t - p, 0, M - 1)
            inp = jnp.where(p == 0,
                            jax.lax.dynamic_index_in_dim(
                                x0_mb, jnp.clip(t, 0, M - 1), keepdims=False),
                            buf)
            out_x, (heads, moments) = jax.lax.scan(stack_body, inp,
                                                   stacked_local)
            valid = ((t - p) >= 0) & ((t - p) < M)
            if loss_fn is None:
                contrib = jnp.where(valid & (p == n_stages - 1),
                                    heads[-1], 0.0)
                preds = preds.at[m].add(contrib)
            else:
                tgt = jax.lax.dynamic_index_in_dim(targets_mb, m,
                                                   keepdims=False)
                # jnp.mean = the Keras per-output reduction
                # (losses.per_stack_losses).
                per_stack = jax.vmap(
                    lambda h: jnp.mean(loss_fn(tgt, h)))(heads)
                lacc = lacc + jnp.where(valid, per_stack, 0.0)
            if carry_stats:
                # moments carry no gradient signal; cut the tape so the
                # pipeline VJP doesn't haul their cotangent structure.
                stats = jax.tree.map(
                    lambda s, mo: jnp.where(
                        valid, mom * s + (1.0 - mom)
                        * jax.lax.stop_gradient(mo), s),
                    stats, moments)
            nxt = jax.lax.ppermute(out_x, pipe_axis, ring)
            return (nxt, preds, lacc, stats), None

        buf0 = jnp.zeros(x0_mb.shape[1:], x0_mb.dtype)
        (_, preds, lacc, stats), _ = jax.lax.scan(
            tick, (buf0, pred_acc, loss_acc, stats0),
            jnp.arange(M + n_stages - 1))
        if loss_fn is None:
            # Only the last stage wrote non-zeros; psum replicates to all.
            return jax.lax.psum(preds, pipe_axis)
        lacc = lacc / M
        # Local loss is a mean over this device's batch shard; average over
        # the data axes so every device holds the global-batch value.
        for ax in other_axes:
            lacc = jax.lax.pmean(lacc, ax)
        # Per-stack vector stays sharded over pipe (gathered by out_spec);
        # the scalar total sums every stage's stacks.
        total = jax.lax.psum(jnp.sum(lacc), pipe_axis)
        if carry_stats:
            # BN moments are computed per-device over the local batch shard;
            # average over the data axes so stats reflect the global batch
            # (and stay identical across data-parallel replicas).
            for ax in other_axes:
                stats = jax.tree.map(lambda s: jax.lax.pmean(s, ax), stats)
            return total, lacc, stats
        return total, lacc

    if loss_fn is None:
        out_specs = act_spec
    elif carry_stats:
        out_specs = (P(), P(pipe_axis), P(pipe_axis))
    else:
        out_specs = (P(), P(pipe_axis))
    return shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(pipe_axis), act_spec, act_spec),
        out_specs=out_specs,
        check_vma=False,
    )


def _microbatch(x, num_microbatches: int):
    B = x.shape[0]
    if B % num_microbatches:
        raise ValueError(
            f"batch {B} not divisible by num_microbatches={num_microbatches}")
    return x.reshape((num_microbatches, B // num_microbatches) + x.shape[1:])


def make_pipeline_forward(
    model: StackedHourglass,
    mesh: Mesh,
    num_microbatches: int,
    pipe_axis: str = "pipe",
    train: bool = False,
):
    """Pipelined inference: fn(front_vars, stacked_vars, images) -> the last
    stack's heatmaps (B, h, w, K) — the reference's eval output (eval.py:108).
    """
    front, stage = _stage_modules(model)
    engine = _pipeline_engine(stage, mesh, pipe_axis, train,
                              loss_fn=None)

    def forward(front_vars, stacked_vars, images):
        if train:
            x0, _ = front.apply(front_vars, images, True,
                                mutable=["batch_stats"])
        else:
            x0 = front.apply(front_vars, images, False)
        x0_mb = _microbatch(x0, num_microbatches)
        # Dummy targets supply only the output (h, w, K) geometry.
        k = model.num_classes
        tgt = jnp.zeros(x0_mb.shape[:-1] + (k,), jnp.float32)
        preds = engine(stacked_vars, x0_mb, tgt)
        return preds.reshape((-1,) + preds.shape[2:])

    return jax.jit(forward)


class PipelineTrainState(struct.PyTreeNode):
    """Train state for the pipelined trainer: variables live pre-split
    (front replicated, stacked sharded over `pipe`), Adam moments mirror
    the param trees. Convert to/from standard full-model variables with
    split/merge_pipeline_variables for checkpoint interop."""

    step: jnp.ndarray
    front: Any
    stacked: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, model: StackedHourglass, tx, rng,
               input_shape=(1, 256, 256, 3)):
        init_rng, state_rng = jax.random.split(rng)
        variables = model.init(init_rng, jnp.zeros(input_shape, jnp.float32),
                               train=False)
        front, stacked = split_pipeline_variables(variables,
                                                  model.num_stacks)
        return cls(step=jnp.zeros((), jnp.int32), front=front,
                   stacked=stacked,
                   opt_state=tx.init((front["params"], stacked["params"])),
                   rng=state_rng)


def make_pipeline_train_step(
    model: StackedHourglass,
    tx,
    loss_fn: Callable,
    config,
    mesh: Mesh,
    num_microbatches: int,
    pipe_axis: str = "pipe",
    augment: bool = True,
):
    """Full pipelined training step: on-device augment + heatmap targets +
    GPipe fwd/bwd + optimizer update, jitted with pipeline shardings
    (stacked params and their Adam moments sharded over `pipe`, front
    replicated, batch over the `data` axis if present).

    Mirrors training.steps.make_train_step's (state, batch) -> (state,
    metrics) contract. BatchNorm normalizes each microbatch with its own
    moments (standard PP semantics) AND the running statistics are carried:
    the front EMA-updates once per step with full-batch moments (exactly
    the sequential trainer), the stacked stages once per microbatch inside
    the GPipe scan (cross-data-axis pmean'd), so a pipelined train -> eval
    round trip uses trained stats, not init-time ones. After short runs the
    usual BN-momentum caveat applies exactly as in the sequential trainer —
    pair with recalibrate_pipeline_batch_stats if needed.
    """
    from single_person_pose_estimation_tpu.ops.augment import augment_batch
    from single_person_pose_estimation_tpu.ops.heatmap import (
        render_heatmaps_batch,
    )

    pipe_loss = make_pipeline_loss_fn(model, mesh, loss_fn,
                                      num_microbatches, pipe_axis,
                                      train=True, carry_stats=True)
    other = [a for a in mesh.axis_names if a != pipe_axis]
    data_axis = other[0] if other else None
    geo_backend = ("matmul2pass" if jax.default_backend() == "tpu"
                   else "gather")

    def step(state: PipelineTrainState, batch):
        rng, next_rng = jax.random.split(state.rng)
        images = batch["image"]
        kx, ky, kv = batch["kx"], batch["ky"], batch["kv"]
        if augment:
            images, kx, ky, kv = augment_batch(
                rng, images, kx, ky, kv,
                label_size=config.label_width,
                flip_pairs=config.flip_pairs,
                geometric_backend=geo_backend,
                scale_min=config.aug_scale_min,
                scale_max=config.aug_scale_max,
                rotate_deg=config.aug_rotate_deg)
        targets = render_heatmaps_batch(
            kx, ky, kv, height=config.label_height,
            width=config.label_width, sigma=config.hm_sigma)

        def loss_on_params(fp, sp):
            f = {"params": fp, "batch_stats": state.front["batch_stats"]}
            s = {"params": sp, "batch_stats": state.stacked["batch_stats"]}
            return pipe_loss(f, s, images, targets)

        (total, (per_stack, front_stats, stacked_stats)), grads = \
            jax.value_and_grad(
                loss_on_params, argnums=(0, 1), has_aux=True)(
                    state.front["params"], state.stacked["params"])
        updates, new_opt = tx.update(
            grads, state.opt_state,
            (state.front["params"], state.stacked["params"]))
        new_fp, new_sp = optax.apply_updates(
            (state.front["params"], state.stacked["params"]), updates)
        new_state = state.replace(
            step=state.step + 1,
            front={"params": new_fp, "batch_stats": front_stats},
            stacked={"params": new_sp, "batch_stats": stacked_stats},
            opt_state=new_opt,
            rng=next_rng,
        )
        metrics = {"loss": total}
        for i in range(model.num_stacks):
            metrics[f"loss/hg{i}"] = per_stack[i]
        return new_state, metrics

    from jax.sharding import NamedSharding
    from jax.tree_util import tree_map_with_path
    repl = NamedSharding(mesh, P())
    piped = NamedSharding(mesh, P(pipe_axis))
    data = NamedSharding(mesh, P(data_axis)) if data_axis else repl

    # Shardings are derived STRUCTURALLY from the known state layout:
    # front/step/rng replicated, stacked sharded over `pipe`. Optimizer
    # state mirrors the (front_params, stacked_params) tuple via tree_map
    # (optax convention), so an opt_state leaf is pipe-sharded iff its
    # pytree path descends through a stacked param dict key (the `hg0_*`
    # names from split_pipeline_variables); scalars like Adam's `count`
    # and front mirrors stay replicated. No shape matching — a replicated
    # leaf that happens to have a num_stacks-sized dim0 cannot be
    # mis-sharded.
    def opt_leaf_sharding(path, _leaf):
        for k in path:
            name = getattr(k, "key", None)
            if isinstance(name, str) and name.startswith("hg0_"):
                return piped
        return repl

    example = jax.eval_shape(
        lambda: PipelineTrainState.create(model, tx, jax.random.PRNGKey(0)))
    state_sh = PipelineTrainState(
        step=repl,
        front=jax.tree.map(lambda _: repl, example.front),
        stacked=jax.tree.map(lambda _: piped, example.stacked),
        opt_state=tree_map_with_path(opt_leaf_sharding, example.opt_state),
        rng=repl,
    )
    return jax.jit(step, in_shardings=(state_sh, data),
                   out_shardings=(state_sh, repl), donate_argnums=(0,))


def make_pipeline_loss_fn(
    model: StackedHourglass,
    mesh: Mesh,
    loss_fn: Callable,
    num_microbatches: int,
    pipe_axis: str = "pipe",
    train: bool = True,
    carry_stats: bool = False,
):
    """Differentiable pipelined loss: fn(front_vars, stacked_vars, images,
    targets) -> (total_loss, per_stack_losses).

    total = sum over stacks of the per-stack loss averaged over microbatches
    — identical to the sequential intermediate-supervision objective
    (losses.per_stack_losses summed, reference trainer.py:35), so
    `jax.grad` of this is a drop-in pipeline-parallel training gradient.

    carry_stats=True (train only) returns (total, (per_stack,
    new_front_batch_stats, new_stacked_batch_stats)) — the BatchNorm
    running statistics after this step: the front updates once with the
    full batch's moments (exactly the sequential trainer's semantics), the
    stacked stages update once per microbatch inside the GPipe scan
    (standard pipeline-parallel BN semantics: as if training at the
    microbatch size). With a data axis the stages see per-replica
    microbatch shards (ghost BN) and the carried stats pmean the
    per-replica moments — exact equality with the sequential (sync-BN
    under GSPMD) trainer holds on a pipe-only mesh with one microbatch
    (pinned in tests/test_pipeline.py). This is what lets a pipelined
    train -> eval round trip use trained statistics instead of silently
    keeping init-time ones.
    """
    front, stage = _stage_modules(model)
    engine = _pipeline_engine(stage, mesh, pipe_axis, train,
                              loss_fn=loss_fn, carry_stats=carry_stats)
    front_run = front.clone(bn_momentum=0.0) if carry_stats else front
    mom = float(model.bn_momentum)

    def pipelined_loss(front_vars, stacked_vars, images, targets):
        if train:
            x0, mut = front_run.apply(front_vars, images, True,
                                      mutable=["batch_stats"])
        else:
            x0 = front.apply(front_vars, images, False)
        x0_mb = _microbatch(x0, num_microbatches)
        tgt_mb = _microbatch(targets.astype(jnp.float32), num_microbatches)
        if not carry_stats:
            return engine(stacked_vars, x0_mb, tgt_mb)
        total, per_stack, stacked_stats = engine(stacked_vars, x0_mb, tgt_mb)
        front_stats = jax.tree.map(
            lambda s, mo: mom * s + (1.0 - mom) * jax.lax.stop_gradient(mo),
            front_vars["batch_stats"], mut["batch_stats"])
        return total, (per_stack, front_stats, stacked_stats)

    return pipelined_loss


def recalibrate_pipeline_batch_stats(model: StackedHourglass,
                                     state: PipelineTrainState, batches,
                                     momentum: float = 0.0
                                     ) -> PipelineTrainState:
    """BN-recalibrate a pipelined train state (the pipeline analog of
    training.steps.recalibrate_batch_stats): merge front/stacked back to
    full-model variables, refresh the running statistics by forwarding
    `batches` in train mode (momentum=0 adopts each batch's moments
    outright), and split the result back into pipeline layout. Params and
    optimizer state are untouched."""
    variables = merge_pipeline_variables(state.front, state.stacked,
                                         model.num_stacks)
    recal_model = model.clone(bn_momentum=momentum)

    @jax.jit
    def one(stats, images):
        _, mut = recal_model.apply(
            {"params": variables["params"], "batch_stats": stats},
            images, train=True, mutable=["batch_stats"])
        return mut["batch_stats"]

    stats = variables["batch_stats"]
    for batch in batches:
        images = batch["image"] if isinstance(batch, dict) else batch
        stats = one(stats, images)
    front, stacked = split_pipeline_variables(
        {"params": variables["params"], "batch_stats": stats},
        model.num_stacks)
    return state.replace(
        front={"params": state.front["params"],
               "batch_stats": front["batch_stats"]},
        stacked={"params": state.stacked["params"],
                 "batch_stats": stacked["batch_stats"]},
    )
