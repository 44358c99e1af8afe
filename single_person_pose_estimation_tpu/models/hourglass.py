"""Stacked Hourglass Network (Newell et al., arXiv:1603.06937) in Flax, NHWC.

Architecture replicates reference model/hourglass.py exactly — layer for
layer, name for name — so TF checkpoints import 1:1 and the param count at
4 stacks / 256 channels is 13,784,260 (Train.ipynb cell 10):

  * front module (hourglass.py:54-68): 7x7/s2 conv(64)+BN -> bottleneck(128)
    -> maxpool -> bottleneck(128) -> bottleneck(256); 256x256 -> 64x64;
  * each hourglass module (hourglass.py:35-52): 4 bottleneck+maxpool
    downsample levels 64->8 (lines 160-181), bottom = maxpool->4x4 + 3
    bottlenecks (127-140), 4 upsample levels of {skip bottleneck, 2x nearest
    upsample, add, merge bottleneck} (96-124, 143-157);
  * dual heads per stack (71-93): 1x1 conv(C)+BN -> 1x1 conv(K, sigmoid)
    prediction head, plus two linear 1x1 convs whose sum with the module
    input feeds the next stack (residual across stacks, line 91);
  * bottleneck (184-206): 1x1(C/2) -> 3x3(C/2) -> 1x1(C), each conv with
    *fused ReLU before BatchNorm* (the reference's nonstandard
    conv->relu->BN ordering, matched here for numeric parity), plus an
    identity skip, or a 1x1 relu conv skip when channel counts differ;
  * mobile=True (209-231) swaps every Conv2D for SeparableConv2D.

Keras-parity details: convs use glorot-uniform kernels and zero biases;
BatchNorm uses epsilon=1e-3 and momentum=0.99 (Keras defaults, NOT the flax
defaults). The model returns a list with one (B, 64, 64, K) heatmap tensor
per stack for intermediate supervision.

TPU-first choices: NHWC layout throughout (native for TPU convs), params
stored float32 with a configurable bf16 compute dtype, optional
rematerialization of each hourglass module to trade FLOPs for HBM.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

# Keras BatchNormalization defaults.
_BN_EPS = 1e-3
_BN_MOMENTUM = 0.99

_KERNEL_INIT = nn.initializers.glorot_uniform()


class _S2DFrontConv(nn.Module):
    """Parameter-compatible drop-in for the front nn.Conv(7x7, s2, SAME):
    same param names ("kernel"/"bias"), shapes, and init, but computed as
    the folded 4x4/s1 conv over the space-to-depth input
    (ops/space_to_depth.py). Exact same function; MXU-friendlier layout."""

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from single_person_pose_estimation_tpu.ops.space_to_depth import (
            front_conv_s2d,
        )

        kernel = self.param("kernel", _KERNEL_INIT,
                            (7, 7, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        return front_conv_s2d(x, kernel, bias)


class _DepthwiseTaps(nn.Module):
    """Depthwise k x k conv computed as k*k shifted per-channel
    multiply-adds instead of a feature_group_count grouped conv.

    Same parameter ("kernel", (k, k, 1, C), same init) and same math as the
    grouped-conv formulation, so the two are freely interchangeable on one
    checkpoint. The hypothesis was that XLA's off-MXU grouped-conv special
    case would lose to plain fusable elementwise work (and unlike the
    Pallas mobile kernels this form is differentiable, so TRAIN could
    benefit too). MEASURED SLOWER on v5e at S4/256 @ 256^2 (interleaved
    medians, scripts/bench_mobile_taps_ab.py): train 311 vs 423 img/s
    (-26%), XLA eval forward 1,792 vs 2,287 (-22%) — each of the 9 taps
    re-reads the padded tensor from HBM and XLA does not collapse them
    into one pass, while its native depthwise lowering does; kept as an
    equality-tested dial + documented negative result (PERF.md).
    k == 1 degenerates to a per-channel scale. Products are accumulated
    in f32 (matching XLA conv semantics).
    """

    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", _KERNEL_INIT, (k, k, 1, C),
                            jnp.float32)
        # Round taps to the compute dtype exactly as nn.Conv would, then
        # lift to f32 so per-tap products accumulate exactly.
        taps = kernel.astype(self.dtype).astype(jnp.float32)
        x = x.astype(self.dtype)
        if k == 1:
            return (x.astype(jnp.float32) * taps[0, 0, 0]).astype(self.dtype)
        pad = k // 2
        B, H, W, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        acc = jnp.zeros(x.shape, jnp.float32)
        for dy in range(k):
            for dx in range(k):
                acc = acc + (xp[:, dy:dy + H, dx:dx + W, :]
                             .astype(jnp.float32) * taps[dy, dx, 0])
        return acc.astype(self.dtype)


class _DepthwiseDense(nn.Module):
    """Depthwise k x k conv computed as a DENSE conv with a block-diagonal
    kernel: the same ("kernel", (k, k, 1, C)) parameter is scattered onto
    the diagonal of a (k, k, C, C) kernel at trace time and run through
    the regular MXU conv path.

    Rationale: the train step is HBM-bound with the MXU at ~27% (PERF.md
    train-step anatomy), XLA's grouped-conv special case runs off-MXU,
    and the taps re-lowering (above) loses on HBM re-reads. A dense conv
    moves the depthwise work onto the idle MXU at the cost of C x more
    multiply-adds on zeros — free IF the op stays bandwidth-bound. The
    VJP is exact: the parameter gradient flows back through the eye-mask
    broadcast, so off-diagonal dense-kernel gradients are discarded and
    d/dparam equals the grouped conv's. Checkpoints interchange with the
    other lowerings (identical parameter, same init).

    Measured (v5e, interleaved A/B medians — PERF.md negative-results
    table): LOSES both ways — mobile train 346.3 vs 421.9 img/s (-18%),
    mobile XLA eval forward 1,850 vs 2,295 (-19%). At C=256 a dense 3x3
    conv per separable site is the full standard-model conv cost, and
    that MXU time serializes with the HBM traffic instead of hiding
    under it. Kept as a documented negative result; "conv" stays the
    default.
    """

    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", _KERNEL_INIT, (k, k, 1, C),
                            jnp.float32)
        taps = kernel.astype(self.dtype)
        # (k, k, 1, C) * (C, C) eye -> (k, k, C, C) block-diagonal.
        dense = taps * jnp.eye(C, dtype=self.dtype)[None, None]
        x = x.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x, dense, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class SeparableConv(nn.Module):
    """Keras SeparableConv2D equivalent: depthwise k x k then pointwise 1x1.

    Parameter layout matches Keras (depthwise kernel (k, k, Cin, 1),
    pointwise kernel (1, 1, Cin, Cout), single bias on the pointwise), so
    param counts and weight import line up with the reference's mobile
    variant (hourglass.py:209-231).

    depthwise_impl selects the lowering (parameters are identical):
    "conv" = feature_group_count grouped conv (default),
    "dense" = block-diagonal dense conv on the MXU (_DepthwiseDense;
    measured -18..-19% on v5e — see its docstring),
    "taps" = shifted per-channel multiply-adds (_DepthwiseTaps; measured
    slower on v5e — see its docstring).
    """

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32
    depthwise_impl: str = "conv"

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        if self.depthwise_impl == "taps":
            x = _DepthwiseTaps(kernel_size=self.kernel_size,
                               dtype=self.dtype, name="depthwise")(x)
        elif self.depthwise_impl == "dense":
            x = _DepthwiseDense(kernel_size=self.kernel_size,
                                dtype=self.dtype, name="depthwise")(x)
        elif self.depthwise_impl == "conv":
            x = nn.Conv(
                features=in_features,
                kernel_size=(self.kernel_size, self.kernel_size),
                feature_group_count=in_features,
                use_bias=False,
                padding="SAME",
                kernel_init=_KERNEL_INIT,
                dtype=self.dtype,
                name="depthwise",
            )(x)
        else:
            raise ValueError(
                f"depthwise_impl must be 'conv', 'dense', or 'taps', "
                f"got {self.depthwise_impl!r}")
        x = nn.Conv(
            features=self.features,
            kernel_size=(1, 1),
            use_bias=True,
            padding="SAME",
            kernel_init=_KERNEL_INIT,
            dtype=self.dtype,
            name="pointwise",
        )(x)
        return x


class StackedHourglass(nn.Module):
    """The stacked hourglass model. Call returns [per-stack heatmaps]."""

    num_classes: int = 17
    num_stacks: int = 2
    num_channels: int = 256
    predict_activation: str = "sigmoid"
    mobile: bool = False
    compute_dtype: Any = jnp.float32
    # Rematerialization of each hourglass module (and the front). The
    # train-step bottleneck is saved-activation HBM traffic (fwd+bwd moves
    # ~113 GB at B=64, ~859 GB/s = HBM speed-of-light while the MXU sits at
    # 27% — scripts/bench_bwd_variants.py), but neither remat mode beats
    # the default on v5e; both are kept as documented measured experiments:
    #   False      — save every residual (XLA default). FASTEST: 131 ms.
    #   True       — full module remat: recompute everything incl. convs
    #                in bwd. 161 ms (+22%, re-runs MXU work).
    #   "conv_out" — save ONLY conv outputs (jax.checkpoint_name tags),
    #                recompute the elementwise/reduction chain (ReLU, BN +
    #                batch stats, adds, pool, upsample) in bwd. Grads are
    #                bit-exact, but XLA re-MATERIALIZES the recomputed
    #                chain in HBM instead of fusing it into the consumers:
    #                bytes go UP (133 GB) and fwd+bwd hits 219 ms. Cutting
    #                residual bytes needs a hand-fused bwd kernel, not a
    #                remat policy.
    remat: Any = False
    bn_momentum: float = _BN_MOMENTUM  # Keras default; 0.0 = adopt batch stats
    # Space-to-depth front: compute the 7x7/s2 opening conv as the exactly
    # equivalent 4x4/s1 conv over the 2x2-blocked 12-channel input
    # (ops/space_to_depth.py — a 3-deep reduction underfills the MXU).
    # Same stored (7, 7, 3, 64) parameter, so checkpoints/weight imports
    # are interchangeable between the two settings.
    front_s2d: bool = False
    # mobile=True depthwise lowering: "conv" = grouped conv (default),
    # "dense" = block-diagonal dense conv on the MXU (measured -18..-19%
    # on v5e, _DepthwiseDense), "taps" = shifted per-channel
    # multiply-adds (measured -22..-26%, _DepthwiseTaps). Both
    # alternatives are kept as documented negative results — see PERF.md.
    # Parameters are identical in every mode; see SeparableConv.
    mobile_depthwise: str = "conv"

    # ------------------------------------------------------------------
    def _activate(self, y, activation):
        if activation == "relu":
            return nn.relu(y)
        if activation == "sigmoid":
            # Head nonlinearity in float32 for numerical parity.
            return jax.nn.sigmoid(y.astype(jnp.float32))
        if activation == "linear":
            return y
        raise ValueError(f"unknown activation {activation}")

    def _conv(self, x, features, kernel_size, name, activation="relu"):
        """Plain Conv2D + fused activation (front module and heads always use
        plain convs in the reference, even in mobile mode)."""
        y = nn.Conv(features=features,
                    kernel_size=(kernel_size, kernel_size),
                    padding="SAME",
                    kernel_init=_KERNEL_INIT,
                    dtype=self.compute_dtype,
                    name=name)(x)
        y = checkpoint_name(y, "conv_out")
        return self._activate(y, activation)

    def _bconv(self, x, features, kernel_size, name, activation="relu"):
        """Bottleneck conv: SeparableConv2D when mobile=True (hourglass.py:209-231),
        plain Conv2D otherwise (hourglass.py:184-206)."""
        if self.mobile:
            y = SeparableConv(features=features, kernel_size=kernel_size,
                              dtype=self.compute_dtype,
                              depthwise_impl=self.mobile_depthwise,
                              name=name)(x)
            y = checkpoint_name(y, "conv_out")
            return self._activate(y, activation)
        return self._conv(x, features, kernel_size, name, activation)

    def _bn(self, x, train: bool, name: str):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=_BN_EPS,
            dtype=self.compute_dtype,
            name=name,
        )(x)

    def _bottleneck(self, x, num_out_channels: int, name: str, train: bool):
        """Reference bottleneck_block (hourglass.py:184-206): conv->relu->BN
        chain 1x1(C/2) -> 3x3(C/2) -> 1x1(C) with identity-or-1x1 skip."""
        if x.shape[-1] == num_out_channels:
            skip = x
        else:
            skip = self._bconv(x, num_out_channels, 1, name + "_skip")
        y = self._bconv(x, num_out_channels // 2, 1, name + "_conv_1x1_1")
        y = self._bn(y, train, name + "_conv_1x1_1_bn")
        y = self._bconv(y, num_out_channels // 2, 3, name + "_conv_3x3_2")
        y = self._bn(y, train, name + "_conv_3x3_2_bn")
        y = self._bconv(y, num_out_channels, 1, name + "_conv_1x1_3")
        y = self._bn(y, train, name + "_conv_1x1_3_bn")
        return skip + y

    def _maxpool(self, x):
        return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))

    def _hourglass_module(self, x, hg_id: int, train: bool, is_last: bool):
        """One hourglass (hourglass.py:35-52): encoder-decoder + dual heads.

        For the final stack the next-stage head convs (conv_1x1_2/conv_1x1_3)
        and residual add are dead code; Keras prunes them from the reference
        Model graph (which is why S4/256 counts 13,784,260 params, not
        13,854,660), so they are skipped here too.
        """
        c = self.num_channels
        name = f"hg{hg_id}"

        # Downsample blocks (hourglass.py:160-181).
        f1 = self._bottleneck(x, c, name + "_downsample_f1", train)
        p = self._maxpool(f1)
        f2 = self._bottleneck(p, c, name + "_downsample_f2", train)
        p = self._maxpool(f2)
        f4 = self._bottleneck(p, c, name + "_downsample_f4", train)
        p = self._maxpool(f4)
        f8 = self._bottleneck(p, c, name + "_downsample_f8", train)

        # Bottom block at 4x4 (hourglass.py:127-140).
        b = self._maxpool(f8)
        b = self._bottleneck(b, c, name + "_downsample_f8_1", train)
        b = self._bottleneck(b, c, name + "_downsample_f8_2", train)
        b = self._bottleneck(b, c, name + "_downsample_f8_3", train)

        # Upsample + skip-add levels (hourglass.py:96-124, 143-157).
        u = b
        for feat, lvl in ((f8, "f8"), (f4, "f4"), (f2, "f2"), (f1, "f1")):
            d = self._bottleneck(feat, c, f"{name}_upsample_{lvl}_short", train)
            u = d + _nearest_upsample_2x(u)
            u = self._bottleneck(u, c, f"{name}_upsample_{lvl}_merged", train)

        # Dual heads (hourglass.py:71-93).
        head = self._conv(u, c, 1, name + "_conv_1x1_1")
        head = self._bn(head, train, name + "_conv_1x1_1_bn")
        head_predict = self._conv(head, self.num_classes, 1,
                                  name + "_conv_1x1_predict",
                                  activation=self.predict_activation)
        if is_last:
            return x, head_predict
        h2 = self._conv(head, c, 1, name + "_conv_1x1_2", activation="linear")
        hm = self._conv(head_predict.astype(self.compute_dtype), c, 1,
                        name + "_conv_1x1_3", activation="linear")
        head_next = h2 + hm + x  # residual across stacks (hourglass.py:91)
        return head_next, head_predict

    def _front(self, x, train: bool):
        """Front module (hourglass.py:54-68): 7x7/s2 conv is the only strided
        conv; it is a plain Conv2D even in mobile mode (only bottleneck
        convs are swapped for separable convs — hourglass.py:9-11)."""
        c = self.num_channels
        if self.front_s2d:
            y = _S2DFrontConv(dtype=self.compute_dtype,
                              name="front_conv_1x1_1")(x)
        else:
            y = nn.Conv(features=64, kernel_size=(7, 7), strides=(2, 2),
                        padding="SAME", kernel_init=_KERNEL_INIT,
                        dtype=self.compute_dtype, name="front_conv_1x1_1")(x)
        y = checkpoint_name(y, "conv_out")
        y = nn.relu(y)
        y = self._bn(y, train, "front_conv_1x1_1_bn")

        y = self._bottleneck(y, c // 2, "front_bottleneck_1", train)
        y = self._maxpool(y)
        y = self._bottleneck(y, c // 2, "front_bottleneck_2", train)
        y = self._bottleneck(y, c, "front_bottleneck_3", train)
        return y

    # ------------------------------------------------------------------
    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if x.ndim != 4 or x.shape[1] % 64 or x.shape[2] % 64:
            # 2 front downsamples + 4 hourglass levels + bottom pool = /64;
            # anything else fails deep in the upsample adds with an opaque
            # broadcast error (same constraint as the reference model).
            raise ValueError(
                f"input must be (B, H, W, 3) with H and W divisible by 64; "
                f"got {x.shape}")
        x = x.astype(self.compute_dtype)

        policy = None
        if self.remat == "conv_out":
            policy = jax.checkpoint_policies.save_only_these_names(
                "conv_out")

        if policy is not None:
            front = nn.remat(StackedHourglass._front, static_argnums=(2,),
                             policy=policy)
            y = front(self, x, train)
        else:
            y = self._front(x, train)

        outputs = []
        for i in range(self.num_stacks):
            is_last = i == self.num_stacks - 1
            if self.remat:
                mod = nn.remat(StackedHourglass._hourglass_module,
                               static_argnums=(2, 3, 4), policy=policy)
                y, head = mod(self, y, i, train, is_last)
            else:
                y, head = self._hourglass_module(y, i, train, is_last)
            outputs.append(head.astype(jnp.float32))
        return outputs


def _nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Keras UpSampling2D (nearest, 2x) for NHWC tensors.

    Implemented as reshape+broadcast (no gather): XLA lowers this to a cheap
    layout change that fuses with the following add.
    """
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def create_hourglass_model(
    num_classes: int,
    num_stacks: int,
    num_channels: int,
    input_shape: Sequence[int] = (256, 256, 3),
    predict_activation: str = "sigmoid",
    mobile: bool = False,
    compute_dtype: Any = jnp.float32,
    remat: bool = False,
):
    """Factory mirroring reference create_hourglass_model (hourglass.py:5-32).

    Returns the Module; initialize with `model.init(key, dummy, train=False)`.
    """
    del input_shape  # shape is implied by the input array in JAX
    return StackedHourglass(
        num_classes=num_classes,
        num_stacks=num_stacks,
        num_channels=num_channels,
        predict_activation=predict_activation,
        mobile=mobile,
        compute_dtype=compute_dtype,
        remat=remat,
    )
