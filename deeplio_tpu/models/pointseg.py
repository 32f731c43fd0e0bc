"""PointSeg segmentation backbone (reference:
``deeplio/models/nets/pointseg_net.py`` — SqueezeSeg-style conv stem, Fire
encoder with SE attention and an ASPP/EL context layer, FireDeconv decoder
with skip connections; SURVEY.md §2.3).

Used two ways, like the reference:
  * standalone segmentation net (``num_classes`` logits per pixel) so the
    backbone can be pretrained on segmentation labels, and
  * as the LiDAR odometry feature encoder (``part="encoder"``), returning
    the bottleneck feature map (plus skip maps if a caller wants them).

Downsampling is width-biased: strides (1,2) keep all 64 laser rows while
azimuth shrinks — the SqueezeSeg convention for range images.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from typing import Tuple

from deeplio_tpu.models.blocks import (ASPP, ConvBN, FactorizedStem, Fire,
                                       FireDeconv, SELayer, space_to_depth)


class PointSegEncoder(nn.Module):
    """Conv stem + Fire stack. Returns (bottleneck, skips).

    TPU-first knobs (all default to the reference-shaped classic forms;
    both measured on v5e and left OFF for the flagship — decision records
    in benchmarks/bench_tower.py and docs/performance.md):
      * ``stem="s2d"``: space-to-depth the (h_stride, w_stride) block into
        channels and run a stride-1 2x2 conv instead of a strided 3x3 over
        the raw C~10 input. Same output grid, equivalent expressive power.
        Measured NEUTRAL (29.2 -> 29.7 ms tower fwd+bwd at B=128): the
        transpose materializes the same full-resolution array the strided
        conv reads, so no traffic is saved.
      * ``stem="s2d-pre"``: s2d layout emitted by the DATA side
        (train/step.py fuses the relayout into the projection epilogue /
        pair assembly; blocks.space_to_depth_pairs) — the encoder input is
        already [B*, H/h, W/w, h*w*2C] and the stem is the stride-1 2x2
        conv directly. Param-identical to stem="s2d".
      * ``fire="fused"``: single-conv Fire modules — measured 2x WORSE
        (deep stages are MXU-bound; see blocks.Fire).
    """

    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    use_bn: bool = True
    with_se: bool = True
    h_stride: int = 1  # 2 = halve laser rows in the stem (TPU fast path)
    w_stride: int = 2  # stem azimuth stride (4 = extra-fast TPU path)
    el_squeeze: int = 0  # >0: bottlenecked EL/ASPP (see blocks.ASPP)
    # "factorized": per-frame stem + pair-sum on the downsampled grid
    # (blocks.FactorizedStem) — input is then per-FRAME [B, S, H, W, C]
    # with ``combos`` defining the pairs, instead of the pair stack.
    stem: str = "classic"  # classic | pair-split | s2d | s2d-pre | factorized
    # pair-split: x is an (img_i, img_j) TUPLE; the stem conv splits its
    # kernel along input features (blocks.SplitInputConv) so the pair
    # concat is never materialized. Param-identical to stem="classic".
    combos: Tuple[Tuple[int, int], ...] = ()  # factorized stem pairs
    fire: str = "classic"  # classic | fused
    # pool="cheap": (1,2) window instead of the classic overlapping (3,3)
    # (measured neutral end-to-end). pool="stride": NO pool ops at all —
    # each stage's entry Fire downsamples via a strided squeeze conv, so
    # the pooled copies of the widest activations are never materialized
    # (the tower is aggregate-bandwidth-bound; pools cost ~5.7 ms/step in
    # fwd compare-selects + select-and-scatter backwards).
    # pool="stride-fold": stride mode with fire2's (1,2) entry stride
    # FOLDED into the stem (stem runs at (h, 2w) with explicit (1,1)
    # padding; fire2 unstrided). An EXACT graph rewrite — a stride-(1,2)
    # 1x1 conv after the stem reads only its even columns, so composing
    # the strides computes the identical function while never
    # materializing the odd stem columns — but ONLY when the skips are
    # unused (part="encoder"): the c1 skip comes out at W/(2*w_stride).
    # Requires stem="classic" (the fold reasons about the 3x3 taps).
    pool: str = "classic"  # classic | cheap | stride | stride-fold

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name

        # fire="mixed": single-conv Fire for the SHALLOW stages only
        # (fire2-5), classic factorized Fire for the deep ones. The round-2
        # audit showed the two regimes: fire6-9/EL run ~MXU-roofline (the
        # fused form's ~10x FLOPs are NOT free there — fire="fused"
        # measured 2x worse overall), while fire2-5 run far under roofline
        # (thin squeeze channels waste the MXU's 128-lane contraction and
        # the stages are materialization-bound) — there the single wide
        # conv trades free FLOPs for fewer kernels and no squeeze/expand
        # intermediates. docs/performance.md has the measurements.
        def fire(sq, e1, e3, strides=(1, 1), deep=False):
            f = self.fire == "fused" or (self.fire == "mixed" and not deep)
            return Fire(sq, e1, e3, self.use_bn, self.dtype, ax, fused=f,
                        strides=strides)

        fold = self.pool == "stride-fold"
        if self.pool == "cheap":
            def pool(t):
                return nn.max_pool(t, (1, 2), strides=(1, 2), padding="SAME")
        elif self.pool in ("stride", "stride-fold"):
            def pool(t):
                return t            # stage-entry Fires downsample instead
        else:
            def pool(t):
                return nn.max_pool(t, (3, 3), strides=(1, 2), padding="SAME")
        entry = (1, 2) if self.pool in ("stride", "stride-fold") else (1, 1)

        # Stem: H/h_stride, W/w_stride (W/2w_stride when folded).
        if self.stem == "factorized":
            c1 = FactorizedStem(self.combos, 64, (3, 3),
                                (self.h_stride, self.w_stride),
                                use_bn=self.use_bn, dtype=self.dtype,
                                axis_name=ax)(x, train)
        elif self.stem == "s2d":
            xs = space_to_depth(x, self.h_stride, self.w_stride)
            c1 = ConvBN(64, (2, 2), (1, 1), use_bn=self.use_bn,
                        dtype=self.dtype, axis_name=ax)(xs, train)
        elif self.stem == "s2d-pre":
            # Input is ALREADY space-to-depth'd (train/step.py emits the
            # layout straight out of the projection epilogue via
            # blocks.space_to_depth_pairs) — same param tree as stem="s2d"
            # (both: first submodule = ConvBN(64, (2,2)) on h*w*2C chans).
            c1 = ConvBN(64, (2, 2), (1, 1), use_bn=self.use_bn,
                        dtype=self.dtype, axis_name=ax)(x, train)
        elif fold:
            # Composed stride with the UNFOLDED stem's SAME pads made
            # explicit: SAME at the composed stride would re-center the
            # 3x3 taps, breaking exactness. With the unfolded pads the
            # folded output x reads exactly the columns the
            # stem-then-even-slice would. (stem="pair-split" flows through
            # here too: x is then an (img_i, img_j) tuple and ConvBN
            # computes the input-split conv — blocks.SplitInputConv.)
            def same_pads(size, s, k=3):
                total = max((-(-size // s) - 1) * s + k - size, 0)
                return total // 2, total - total // 2

            ref = x[0] if isinstance(x, (tuple, list)) else x
            H, W = ref.shape[1], ref.shape[2]
            pads = (same_pads(H, self.h_stride), same_pads(W, self.w_stride))
            ow = -(-(-(-W // self.w_stride)) // 2)  # ceil(ceil(W/w)/2)
            got = (W + pads[1][0] + pads[1][1] - 3) // (2 * self.w_stride) + 1
            if got != ow:
                raise ValueError(
                    f"stride-fold width mismatch: W={W}, w_stride="
                    f"{self.w_stride} -> {got} != {ow}; use pool=stride")
            c1 = ConvBN(64, (3, 3), (self.h_stride, 2 * self.w_stride),
                        use_bn=self.use_bn, dtype=self.dtype,
                        axis_name=ax, padding=pads)(x, train)
        else:
            c1 = ConvBN(64, (3, 3), (self.h_stride, self.w_stride),
                        use_bn=self.use_bn, dtype=self.dtype,
                        axis_name=ax)(x, train)
        p1 = pool(c1)                                       # W/4

        f2 = fire(16, 64, 64, (1, 1) if fold else entry)(p1, train)
        f3 = fire(16, 64, 64)(f2, train)
        if self.with_se:
            f3 = SELayer(dtype=self.dtype)(f3)
        f3 = f3 + f2                                        # residual
        p3 = pool(f3)                                       # W/8

        f4 = fire(32, 128, 128, entry)(p3, train)
        f5 = fire(32, 128, 128)(f4, train)
        if self.with_se:
            f5 = SELayer(dtype=self.dtype)(f5)
        f5 = f5 + f4
        p5 = pool(f5)                                       # W/16

        f6 = fire(48, 192, 192, entry, deep=True)(p5, train)
        f7 = fire(48, 192, 192, deep=True)(f6, train)
        f8 = fire(64, 256, 256, deep=True)(f7, train)
        f9 = fire(64, 256, 256, deep=True)(f8, train)
        el = ASPP(512, squeeze=self.el_squeeze, dtype=self.dtype)(f9)

        skips = (c1, f3, f5)  # W/2, W/4, W/8 grids
        return el, skips


class PointSegDecoder(nn.Module):
    """FireDeconv upsampling chain with encoder skips -> per-pixel features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, train: bool = True):
        c1, f3, f5 = skips
        d10 = FireDeconv(64, 128, 128, self.dtype)(x, train)     # W/8
        d10 = d10 + f5
        d11 = FireDeconv(32, 64, 64, self.dtype)(d10, train)     # W/4
        d11 = d11 + f3
        d12 = FireDeconv(16, 32, 32, self.dtype)(d11, train)     # W/2
        d12 = d12 + c1
        return d12


class PointSegNet(nn.Module):
    """Full segmentation net: encoder (+decoder) (+classifier head).

    part: "encoder" -> returns bottleneck feature map [B, H, W/16, 512]
          "encoder+decoder" -> per-pixel feature map [B, H, W/2, 64]
    num_classes: if set (standalone segmentation use), a 1x1 conv head (+
          width-2 upsample) maps decoder features to [B, H, W, classes].
    """

    part: str = "encoder"
    num_classes: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    use_bn: bool = True
    with_se: bool = True
    h_stride: int = 1
    w_stride: int = 2
    el_squeeze: int = 0
    stem: str = "classic"
    combos: Tuple[Tuple[int, int], ...] = ()
    fire: str = "classic"
    pool: str = "classic"

    @nn.compact
    def __call__(self, x, train: bool = True):
        feat, skips = PointSegEncoder(
            dtype=self.dtype, axis_name=self.axis_name, use_bn=self.use_bn,
            with_se=self.with_se, h_stride=self.h_stride,
            w_stride=self.w_stride, el_squeeze=self.el_squeeze,
            stem=self.stem, combos=self.combos, fire=self.fire,
            pool=self.pool, name="encoder")(x, train)
        if self.part == "encoder" and self.num_classes is None:
            return feat
        dec = PointSegDecoder(self.dtype, name="decoder")(feat, skips, train)
        if self.num_classes is None:
            return dec
        # The decoder restores the stem's grid (H/h_stride x W/w_stride in
        # every pool mode); one transposed conv with the stem's strides
        # brings it back to full resolution. Kernel (1, 4) is kept for the
        # default (1, 2) so existing checkpoints keep their param shapes.
        if (self.h_stride, self.w_stride) == (1, 2):
            kernel = (1, 4)
        else:
            kernel = (1 if self.h_stride == 1 else 2 * self.h_stride,
                      2 * self.w_stride)
        up = nn.ConvTranspose(64, kernel,
                              strides=(self.h_stride, self.w_stride),
                              padding="SAME", dtype=self.dtype)(dec)
        logits = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                         dtype=jnp.float32)(up)
        return logits
