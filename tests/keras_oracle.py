"""Keras oracle of the reference hourglass architecture, used ONLY in tests
as the numeric-parity target (modern Keras API; architecture per
reference model/hourglass.py as documented in SURVEY.md C6: conv->relu->BN
ordering, dual heads, last-stack head pruning, mobile separable variant).
"""

from __future__ import annotations


def build_keras_hourglass(num_classes=17, num_stacks=1, num_channels=64,
                          input_size=64, mobile=False):
    from keras import Model
    from keras.layers import (
        Add,
        BatchNormalization,
        Conv2D,
        Input,
        MaxPool2D,
        SeparableConv2D,
        UpSampling2D,
    )

    ConvCls = SeparableConv2D if mobile else Conv2D

    def bottleneck(x, nc, name):
        if x.shape[-1] == nc:
            skip = x
        else:
            skip = ConvCls(nc, 1, activation="relu", padding="same",
                           name=name + "_skip")(x)
        y = ConvCls(nc // 2, 1, activation="relu", padding="same",
                    name=name + "_conv_1x1_1")(x)
        y = BatchNormalization()(y)
        y = ConvCls(nc // 2, 3, activation="relu", padding="same",
                    name=name + "_conv_3x3_2")(y)
        y = BatchNormalization()(y)
        y = ConvCls(nc, 1, activation="relu", padding="same",
                    name=name + "_conv_1x1_3")(y)
        y = BatchNormalization()(y)
        return Add(name=name + "_add")([skip, y])

    inp = Input(shape=(input_size, input_size, 3))
    x = Conv2D(64, 7, strides=2, padding="same", activation="relu",
               name="front_conv_1x1_1")(inp)
    x = BatchNormalization()(x)
    x = bottleneck(x, num_channels // 2, "front_bottleneck_1")
    x = MaxPool2D(2, 2)(x)
    x = bottleneck(x, num_channels // 2, "front_bottleneck_2")
    x = bottleneck(x, num_channels, "front_bottleneck_3")

    outputs = []
    for i in range(num_stacks):
        name = f"hg{i}"
        f1 = bottleneck(x, num_channels, name + "_downsample_f1")
        p = MaxPool2D(2, 2)(f1)
        f2 = bottleneck(p, num_channels, name + "_downsample_f2")
        p = MaxPool2D(2, 2)(f2)
        f4 = bottleneck(p, num_channels, name + "_downsample_f4")
        p = MaxPool2D(2, 2)(f4)
        f8 = bottleneck(p, num_channels, name + "_downsample_f8")
        b = MaxPool2D()(f8)
        b = bottleneck(b, num_channels, name + "_downsample_f8_1")
        b = bottleneck(b, num_channels, name + "_downsample_f8_2")
        b = bottleneck(b, num_channels, name + "_downsample_f8_3")
        u = b
        for feat, lvl in ((f8, "f8"), (f4, "f4"), (f2, "f2"), (f1, "f1")):
            d = bottleneck(feat, num_channels, f"{name}_upsample_{lvl}_short")
            up = UpSampling2D()(u)
            u = Add()([d, up])
            u = bottleneck(u, num_channels, f"{name}_upsample_{lvl}_merged")
        head = Conv2D(num_channels, 1, activation="relu", padding="same",
                      name=name + "_conv_1x1_1")(u)
        head = BatchNormalization()(head)
        head_predict = Conv2D(num_classes, 1, activation="sigmoid",
                              padding="same",
                              name=name + "_conv_1x1_predict")(head)
        outputs.append(head_predict)
        if i < num_stacks - 1:
            h2 = Conv2D(num_channels, 1, activation="linear", padding="same",
                        name=name + "_conv_1x1_2")(head)
            hm = Conv2D(num_channels, 1, activation="linear", padding="same",
                        name=name + "_conv_1x1_3")(head_predict)
            x = Add()([h2, hm, x])

    return Model(inputs=inp, outputs=outputs)


def randomize_keras_weights_scaled(model, seed=0):
    """Fan-in-scaled random weights + contracting BN gammas.

    The plain randomizer's uniform(-0.15, 0.15) kernels explode activations
    at 256 channels (layer gain ~ sqrt(fan_in * var) >> 1), saturating the
    sigmoid heads and making flagship-geometry parity checks vacuous
    (every output pinned at exactly 0/1). Here kernels are ~glorot
    (a = sqrt(3/fan_in)) and BN gamma in (0.3, 0.6) contracts the residual
    adds' variance growth, so S4/256 @ 256x256 outputs stay in the
    sigmoid's responsive range and f32 rounding stays ~1e-6.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    for layer in model.layers:
        cls = type(layer).__name__
        ws = layer.get_weights()
        if cls == "BatchNormalization":
            layer.set_weights([
                rng.uniform(0.3, 0.6, ws[0].shape).astype(np.float32),
                rng.uniform(-0.05, 0.05, ws[1].shape).astype(np.float32),
                rng.uniform(-0.1, 0.1, ws[2].shape).astype(np.float32),
                rng.uniform(0.8, 1.2, ws[3].shape).astype(np.float32),
            ])
        elif ws:
            new = []
            for w in ws:
                if w.ndim >= 2:
                    fan_in = int(np.prod(w.shape[:-1]))
                    a = np.sqrt(3.0 / fan_in)
                    new.append(rng.uniform(-a, a, w.shape).astype(np.float32))
                else:
                    new.append(
                        rng.uniform(-0.05, 0.05, w.shape).astype(np.float32))
            layer.set_weights(new)


def randomize_keras_weights(model, seed=0):
    """Non-trivial weights everywhere, incl. BN moving stats (mean != 0,
    var != 1), so parity tests exercise the full mapping."""
    import numpy as np

    rng = np.random.default_rng(seed)
    for layer in model.layers:
        cls = type(layer).__name__
        ws = layer.get_weights()
        if cls == "BatchNormalization":
            gamma = rng.uniform(0.5, 1.5, ws[0].shape).astype(np.float32)
            beta = rng.uniform(-0.3, 0.3, ws[1].shape).astype(np.float32)
            mean = rng.uniform(-0.5, 0.5, ws[2].shape).astype(np.float32)
            var = rng.uniform(0.5, 1.5, ws[3].shape).astype(np.float32)
            layer.set_weights([gamma, beta, mean, var])
        elif ws:
            layer.set_weights([
                rng.uniform(-0.15, 0.15, w.shape).astype(np.float32)
                for w in ws])
