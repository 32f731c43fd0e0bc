"""SqueezeSeg/PointSeg building blocks (reference:
``deeplio/models/nets/pointseg_modules.py`` — Fire, FireDeconv, SELayer;
SURVEY.md §2.3), as flax modules in NHWC/bf16 for the TPU MXU.

Conventions:
  * channels-last (NHWC); all convs SAME padding;
  * compute dtype configurable (bf16 on TPU), params f32;
  * BatchNorm supports an optional ``axis_name`` so statistics sync across
    a data-parallel mesh axis when the train step runs under shard_map.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class SplitInputConv(nn.Module):
    """``conv(concat(a, b), W)`` computed as ``conv(a, W1) + conv(b, W2)``
    (W split along input features) — mathematically identical, but the
    channel concat is NEVER materialized. At the flagship this deletes the
    step's largest copies (the [B*P, H, W, 2C] pair stack + its conv-input
    relayout, ~1.8 ms/step of pure HBM traffic — docs/performance.md
    round-5 budget). Param tree matches ``nn.Conv`` (names kernel/bias,
    same default inits), so a classic-stem checkpoint loads unchanged.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Union[str, Tuple[Tuple[int, int], Tuple[int, int]]]
    use_bias: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, a, b):
        kh, kw = self.kernel_size
        ca = a.shape[-1]
        cin = ca + b.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        pad = self.padding
        if not isinstance(pad, str):
            pad = tuple(tuple(p) for p in pad)
        dn = ("NHWC", "HWIO", "NHWC")
        y = (jax.lax.conv_general_dilated(
                 a.astype(self.dtype), k[:, :, :ca], self.strides, pad,
                 dimension_numbers=dn)
             + jax.lax.conv_general_dilated(
                 b.astype(self.dtype), k[:, :, ca:], self.strides, pad,
                 dimension_numbers=dn))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    use_bn: bool = True
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    # "SAME" or explicit ((top, bottom), (left, right)) — the stride-fold
    # stem needs explicit (1, 1) padding because SAME padding at the
    # composed stride would shift the tap positions (docs/performance.md).
    padding: Union[str, Tuple[Tuple[int, int], Tuple[int, int]]] = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = True):
        if isinstance(x, (tuple, list)):
            # pair-split stem: two half-channel inputs, one logical conv
            # (name pinned to the auto-name nn.Conv would get, so the
            # param tree is identical across stem modes).
            x = SplitInputConv(self.features, self.kernel, self.strides,
                               self.padding, not self.use_bn, self.dtype,
                               name="Conv_0")(*x)
        else:
            x = nn.Conv(self.features, self.kernel, self.strides,
                        padding=self.padding,
                        use_bias=not self.use_bn, dtype=self.dtype)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             dtype=self.dtype, axis_name=self.axis_name)(x)
        if self.act:
            x = nn.relu(x)
        return x


class SELayer(nn.Module):
    """Squeeze-and-excitation channel attention (PointSeg's SE block)."""

    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2))                     # [B, C]
        s = nn.Dense(max(c // self.reduction, 4), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype)(s)
        s = jax.nn.sigmoid(s)
        return x * s[..., None, None, :]


class Fire(nn.Module):
    """Fire module: 1x1 squeeze -> parallel 1x1 + 3x3 expands, concat.

    ``fused=True`` replaces the three-conv factorization with ONE 3x3
    ConvBN to ``expand1 + expand3`` channels. MEASURED AND REJECTED for
    the flagship (benchmarks/bench_tower.py, v5e, B=128: 29.2 -> 56.1 ms
    fwd+bwd): the deep Fire stages (256-512 ch at W/16) already run near
    the MXU roofline, so the ~10x FLOPs of the fused form are NOT free —
    only the shallow stages are bandwidth-bound. Kept as a config knob
    because the trade flips for thin-channel/wide-image variants. Not
    weight-compatible with the reference's Fire.
    """

    squeeze: int
    expand1: int
    expand3: int
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    fused: bool = False
    # stride applies at the squeeze conv: the module then performs the
    # stage's downsampling itself (pool="stride" encoder variant) without
    # ever materializing a pooled copy of the full-width input.
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.fused:
            return ConvBN(self.expand1 + self.expand3, (3, 3),
                          strides=self.strides, use_bn=self.use_bn,
                          dtype=self.dtype,
                          axis_name=self.axis_name)(x, train)
        s = ConvBN(self.squeeze, (1, 1), strides=self.strides,
                   use_bn=self.use_bn, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        e1 = nn.Conv(self.expand1, (1, 1), padding="SAME", dtype=self.dtype)(s)
        e3 = nn.Conv(self.expand3, (3, 3), padding="SAME", dtype=self.dtype)(s)
        return nn.relu(jnp.concatenate([e1, e3], axis=-1))


class FactorizedStem(nn.Module):
    """Frame-factorized pair stem: conv(concat(a_i, a_j)) == A*a_i + B*a_j.

    The classic stem convolves every PAIR-stacked image ([B*P, H, W, 2C])
    at FULL resolution: with S-frame windows each interior frame is
    convolved twice and the [B, P, H, W, 2C] pair stack is the train
    step's largest materialization. Convolution is linear in its input
    channels, so the 2C->F stem kernel splits into two C->F halves and the
    stem can run PER FRAME instead: one conv C -> 2F over the S frames
    (output channels [0:F] = the first-frame half-kernel A, [F:2F] = the
    second-frame half B), then each pair (i, j) sums u_i + v_j on the
    stem's DOWNSAMPLED grid, before the shared BN/ReLU. Identical math to
    the classic stem (weight-transplant parity test in
    tests/unit/test_models.py), different param layout ([kh,kw,C,2F] vs
    [kh,kw,2C,F] — models/zoo.py::factorize_stem_variables converts).

    Input: frames [B, S, H, W, C]. Output: [B*P, H', W', F] with P =
    len(combos), pairs ordered as given (matching the classic pair stack).
    """

    combos: Tuple[Tuple[int, int], ...]
    features: int = 64
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, frames, train: bool = True):
        b, s = frames.shape[0], frames.shape[1]
        flat = frames.reshape((b * s,) + frames.shape[2:])
        y = nn.Conv(2 * self.features, self.kernel, self.strides,
                    padding="SAME", use_bias=not self.use_bn,
                    dtype=self.dtype)(flat)
        y = y.reshape((b, s) + y.shape[1:])
        u = y[..., :self.features]
        v = y[..., self.features:]
        pre = jnp.stack([u[:, i] + v[:, j] for (i, j) in self.combos], axis=1)
        pre = pre.reshape((b * len(self.combos),) + pre.shape[2:])
        if self.use_bn:
            pre = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                               dtype=self.dtype,
                               axis_name=self.axis_name)(pre)
        return nn.relu(pre)


def space_to_depth(x, h: int, w: int):
    """[B, H, W, C] -> [B, H//h, W//w, h*w*C] block reshape (NHWC)."""
    b, H, W, c = x.shape
    assert H % h == 0 and W % w == 0, (H, W, h, w)
    x = x.reshape(b, H // h, h, W // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, H // h, W // w, h * w * c)


def space_to_depth_pairs(frames, combos, h: int, w: int):
    """Per-frame s2d + pair interleave for the ``s2d-pre`` stem.

    frames [B, S, H, W, C] -> [B, P, H//h, W//w, h*w*2C], bit-identical in
    channel order to ``space_to_depth(concat([f_i, f_j], -1), h, w)`` per
    pair — so variables transplant between stem="s2d" and stem="s2d-pre"
    unchanged. Each frame is relaid out ONCE (9 frame transposes instead
    of 8 full-res pair-stack transposes in the model), and the full-res
    [B, P, H, W, 2C] pair stack is never built."""
    b, s, H, W, c = frames.shape
    fr = space_to_depth(frames.reshape(b * s, H, W, c), h, w)
    fr = fr.reshape(b, s, H // h, W // w, h * w, c)
    pairs = [
        jnp.concatenate([fr[:, i], fr[:, j]], axis=-1)
        .reshape(b, H // h, W // w, h * w * 2 * c)
        for (i, j) in combos
    ]
    return jnp.stack(pairs, axis=1)


class FireDeconv(nn.Module):
    """Fire module with a width-upsampling transposed conv (decoder side).

    Upsamples W by 2 (H preserved) — the SqueezeSeg decoder convention for
    range images whose height is the laser count.
    """

    squeeze: int
    expand1: int
    expand3: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        s = nn.Conv(self.squeeze, (1, 1), padding="SAME", dtype=self.dtype)(x)
        s = nn.relu(s)
        s = nn.ConvTranspose(self.squeeze, (1, 4), strides=(1, 2),
                             padding="SAME", dtype=self.dtype)(s)
        s = nn.relu(s)
        e1 = nn.Conv(self.expand1, (1, 1), padding="SAME", dtype=self.dtype)(s)
        e3 = nn.Conv(self.expand3, (3, 3), padding="SAME", dtype=self.dtype)(s)
        return nn.relu(jnp.concatenate([e1, e3], axis=-1))


class ASPP(nn.Module):
    """Atrous spatial pyramid "enlargement layer" (PointSeg's EL block):
    parallel dilated 3x3 branches + 1x1, summed.

    ``squeeze > 0`` inserts a 1x1 reduction before the dilated pyramid and
    a 1x1 expansion after (DeepLab-style bottlenecked ASPP). Same
    receptive-field pyramid, ~10x fewer FLOPs at 512 wide: the classic
    full-width EL layer is 82% of the lidar tower's FLOPs (three 512->512
    dilated 3x3 convs — docs/performance.md round-2 audit), which no MXU
    schedule can hide. squeeze=0 keeps the full-width form.
    """

    features: int
    rates: Tuple[int, ...] = (1, 2, 4)
    squeeze: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.squeeze > 0:
            s = nn.Conv(self.squeeze, (1, 1), padding="SAME",
                        dtype=self.dtype, name="squeeze")(x)
            s = nn.relu(s)
            outs = [nn.Conv(self.squeeze, (1, 1), padding="SAME",
                            dtype=self.dtype)(s)]
            for r in self.rates:
                outs.append(
                    nn.Conv(self.squeeze, (3, 3), padding="SAME",
                            kernel_dilation=(r, r), dtype=self.dtype)(s)
                )
            y = nn.relu(jnp.concatenate(outs, axis=-1))
            y = nn.Conv(self.features, (1, 1), padding="SAME",
                        dtype=self.dtype, name="expand")(y)
            return nn.relu(y)
        outs = [nn.Conv(self.features, (1, 1), padding="SAME", dtype=self.dtype)(x)]
        for r in self.rates:
            outs.append(
                nn.Conv(self.features, (3, 3), padding="SAME",
                        kernel_dilation=(r, r), dtype=self.dtype)(x)
            )
        return nn.relu(sum(outs))
