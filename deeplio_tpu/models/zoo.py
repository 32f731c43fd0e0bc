"""Top-level model zoo and factory (reference:
``deeplio/models/nets/deeplio_nets.py`` DeepIO/DeepLO/DeepLIO and the
``get_model(cfg)`` factory in ``nets/__init__.py``; SURVEY.md §2.3, §3.3).

The forward contract for every arch:

    apply(variables, batch, train=...) -> (x_pred [B,P,3], q_pred [B,P,4])

with ``batch`` a dict of:
    images:   [B, P, H, W, 2C]  pair-stacked projected frames (lidar archs)
    imu:      [B, P, T, 6]      padded IMU windows  (imu archs)
    imu_mask: [B, P, T]         validity of IMU samples

P = number of frame pairs per window (static, from config combinations).
The whole zoo compiles into one XLA graph together with projection and the
loss (BASELINE.json north-star).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplio_tpu.config.schema import Config, ModelConfig
from deeplio_tpu.models.feat_nets import (
    FusionLayer,
    ImuFeatFC,
    ImuFeatRnn,
    LidarPointSegFeat,
    LidarSimpleFeat0,
    LidarSimpleFeat1,
    OdomFeatFC,
    OdomFeatRNN,
    PoseHeads,
)

Batch = Dict[str, jax.Array]


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


def _flat_pairs(x: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
    """[B, P, ...] -> ([B*P, ...], (B, P))"""
    b, p = x.shape[0], x.shape[1]
    return x.reshape((b * p,) + x.shape[2:]), (b, p)


def _make_lidar_net(cfg: ModelConfig, dtype, axis_name, combos=()):
    lc = cfg.lidar
    if lc.stem != "classic" and lc.name != "lidar-feat-pointseg":
        raise ValueError(
            f"stem={lc.stem} is a PointSeg-stem knob; "
            f"{lc.name!r} has no stem to reshape")
    if lc.name == "lidar-feat-pointseg":
        return LidarPointSegFeat(
            feature_size=lc.feature_size, part=lc.part, dropout=lc.dropout,
            dtype=dtype, axis_name=axis_name, h_stride=lc.h_stride,
            w_stride=lc.w_stride, se=lc.se, el_squeeze=lc.el_squeeze,
            stem=lc.stem, combos=tuple(combos), fire=lc.fire, pool=lc.pool,
            name="lidar_feat")
    if lc.name == "lidar-feat-simple-0":
        return LidarSimpleFeat0(
            feature_size=lc.feature_size, base_channels=lc.base_channels,
            dropout=lc.dropout, dtype=dtype, axis_name=axis_name,
            name="lidar_feat")
    if lc.name == "lidar-feat-simple-1":
        return LidarSimpleFeat1(
            feature_size=lc.feature_size, base_channels=lc.base_channels,
            dropout=lc.dropout, dtype=dtype, axis_name=axis_name,
            name="lidar_feat")
    raise ValueError(f"unknown lidar feat net '{lc.name}'")


def _make_imu_net(cfg: ModelConfig, dtype):
    ic = cfg.imu
    if ic.name == "imu-feat-rnn":
        return ImuFeatRnn(hidden_size=ic.hidden_size, num_layers=ic.num_layers,
                          cell=ic.rnn_type, bidirectional=ic.bidirectional,
                          dtype=dtype, name="imu_feat")
    if ic.name == "imu-feat-fc":
        return ImuFeatFC(hidden_size=ic.hidden_size, num_layers=ic.num_layers,
                         dtype=dtype, name="imu_feat")
    raise ValueError(f"unknown imu feat net '{ic.name}'")


def _make_odom_net(cfg: ModelConfig, dtype):
    oc = cfg.odom
    if oc.name == "odom-feat-rnn":
        return OdomFeatRNN(hidden_size=oc.hidden_size, num_layers=oc.num_layers,
                           cell=oc.rnn_type, dtype=dtype, name="odom_feat")
    if oc.name == "odom-feat-fc":
        return OdomFeatFC(hidden_size=oc.hidden_size, num_layers=oc.num_layers,
                          dtype=dtype, name="odom_feat")
    raise ValueError(f"unknown odom feat net '{oc.name}'")


class DeepIO(nn.Module):
    """IMU-only odometry: imu-feat -> odom-feat -> heads."""

    cfg: ModelConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, batch: Batch, train: bool = True):
        dt = _dtype_of(self.cfg.compute_dtype)
        imu, (b, p) = _flat_pairs(batch["imu"])
        mask, _ = _flat_pairs(batch["imu_mask"])
        feat = _make_imu_net(self.cfg, dt)(imu.astype(dt), mask, train)
        feat = feat.reshape(b, p, -1)
        feat = _make_odom_net(self.cfg, dt)(feat, train)
        flat, _ = _flat_pairs(feat)
        x, q = PoseHeads(dropout=self.cfg.dropout, dtype=dt, name="heads")(flat, train)
        return x.reshape(b, p, 3), q.reshape(b, p, 4)


def _lidar_features(cfg: ModelConfig, axis_name, combos, batch: Batch,
                    dt, train: bool):
    """Run the lidar tower; returns (feat [B*P, F], (b, p)).

    Factorized-stem configs consume per-FRAME images (``batch["frames"]``
    [B, S, H, W, C]); everything else the classic pair stack
    (``batch["images"]`` [B, P, H, W, 2C]).
    """
    if cfg.lidar is not None and cfg.lidar.stem == "factorized":
        frames = batch["frames"]
        b, p = frames.shape[0], len(combos)
        feat = _make_lidar_net(cfg, dt, axis_name, combos)(
            frames.astype(dt), train)
        return feat, (b, p)
    if cfg.lidar is not None and cfg.lidar.stem == "pair-split":
        # images/images2 = pair frame i / frame j stacks [B, P, H, W, C];
        # the channel concat is computed implicitly by the stem's
        # input-split conv (blocks.SplitInputConv) and never materialized.
        left, (b, p) = _flat_pairs(batch["images"])
        right, _ = _flat_pairs(batch["images2"])
        feat = _make_lidar_net(cfg, dt, axis_name)(
            (left.astype(dt), right.astype(dt)), train)
        return feat, (b, p)
    imgs, (b, p) = _flat_pairs(batch["images"])
    feat = _make_lidar_net(cfg, dt, axis_name)(imgs.astype(dt), train)
    return feat, (b, p)


class DeepLO(nn.Module):
    """LiDAR-only odometry: lidar-feat -> odom-feat -> heads."""

    cfg: ModelConfig
    axis_name: Optional[str] = None
    combos: Tuple[Tuple[int, int], ...] = ()

    @nn.compact
    def __call__(self, batch: Batch, train: bool = True):
        dt = _dtype_of(self.cfg.compute_dtype)
        feat, (b, p) = _lidar_features(self.cfg, self.axis_name, self.combos,
                                       batch, dt, train)
        feat = feat.reshape(b, p, -1)
        feat = _make_odom_net(self.cfg, dt)(feat, train)
        flat, _ = _flat_pairs(feat)
        x, q = PoseHeads(dropout=self.cfg.dropout, dtype=dt, name="heads")(flat, train)
        return x.reshape(b, p, 3), q.reshape(b, p, 4)


class DeepLIO(nn.Module):
    """Fused odometry: lidar-feat (+) imu-feat -> fusion -> odom -> heads."""

    cfg: ModelConfig
    axis_name: Optional[str] = None
    combos: Tuple[Tuple[int, int], ...] = ()

    @nn.compact
    def __call__(self, batch: Batch, train: bool = True):
        dt = _dtype_of(self.cfg.compute_dtype)
        lidar, (b, p) = _lidar_features(self.cfg, self.axis_name, self.combos,
                                        batch, dt, train)
        imu, _ = _flat_pairs(batch["imu"])
        mask, _ = _flat_pairs(batch["imu_mask"])
        imu_f = _make_imu_net(self.cfg, dt)(imu.astype(dt), mask, train)
        fused = FusionLayer(kind=self.cfg.fusion.kind, dtype=dt,
                            name="fusion")(lidar, imu_f, train)
        fused = fused.reshape(b, p, -1)
        feat = _make_odom_net(self.cfg, dt)(fused, train)
        flat, _ = _flat_pairs(feat)
        x, q = PoseHeads(dropout=self.cfg.dropout, dtype=dt, name="heads")(flat, train)
        return x.reshape(b, p, 3), q.reshape(b, p, 4)


def build_model(cfg: Config, axis_name: Optional[str] = None) -> nn.Module:
    """Factory: config -> flax module (reference ``get_model``)."""
    mc = cfg.model
    combos = tuple(tuple(c) for c in cfg.datasets.effective_combinations)
    if mc.arch == "deepio":
        return DeepIO(mc, axis_name)
    if mc.arch == "deeplo":
        return DeepLO(mc, axis_name, combos)
    if mc.arch == "deeplio":
        return DeepLIO(mc, axis_name, combos)
    raise ValueError(f"unknown arch '{mc.arch}'")


def example_batch(cfg: Config, batch_size: int = 2) -> Batch:
    """Zero batch with the shapes the model expects — used for init and by
    compile-check entry points."""
    ds = cfg.datasets
    p = ds.num_pairs
    h, w = ds.projection.height, ds.projection.width
    c = ds.num_image_channels
    t = ds.max_imu_per_pair
    batch: Batch = {}
    if cfg.model.arch in ("deeplo", "deeplio"):
        lc = cfg.model.lidar
        if lc is not None and lc.stem == "factorized":
            batch["frames"] = jnp.zeros(
                (batch_size, ds.sequence_size, h, w, c), jnp.float32)
        elif lc is not None and lc.stem == "pair-split":
            batch["images"] = jnp.zeros((batch_size, p, h, w, c),
                                        jnp.float32)
            batch["images2"] = jnp.zeros((batch_size, p, h, w, c),
                                         jnp.float32)
        elif lc is not None and lc.stem == "s2d-pre":
            hs, ws = lc.h_stride, lc.w_stride
            batch["images"] = jnp.zeros(
                (batch_size, p, h // hs, w // ws, hs * ws * 2 * c),
                jnp.float32)
        else:
            batch["images"] = jnp.zeros((batch_size, p, h, w, 2 * c),
                                        jnp.float32)
    if cfg.model.arch in ("deepio", "deeplio"):
        batch["imu"] = jnp.zeros((batch_size, p, t, 6), jnp.float32)
        batch["imu_mask"] = jnp.zeros((batch_size, p, t), jnp.float32)
    return batch


def init_model(cfg: Config, rng: jax.Array, batch_size: int = 2,
               axis_name: Optional[str] = None):
    """Initialise (model, variables) from config with a zero batch."""
    model = build_model(cfg, axis_name)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        example_batch(cfg, batch_size), train=False)
    return model, variables


def init_model_fast(cfg: Config, rng: jax.Array, batch_size: int = 2,
                    axis_name: Optional[str] = None, probe_width: int = 256):
    """Initialise on the host CPU backend with a spatially-reduced probe.

    Every parameter shape in the zoo is independent of the image's spatial
    extent (all lidar towers end in a spatial mean before their Dense, and
    conv kernels depend only on channel counts), and flax initializers
    depend only on (rng, param shape) — so initialising with a narrower
    probe image yields *bit-identical* parameters while skipping the
    expensive full-resolution on-device init program (~124 s through the
    axon relay at flagship scale). The resulting tree is verified against a
    full-size ``jax.eval_shape`` before returning; any mismatch falls back
    to the exact :func:`init_model` path.

    Returns (model, variables) with CPU-backed arrays — callers device_put
    (e.g. ``parallel.replicate``) them onto the mesh.
    """
    import numpy as np

    model = build_model(cfg, axis_name)
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    full = example_batch(cfg, batch_size)
    expected = jax.eval_shape(lambda b: model.init(rngs, b, train=False), full)

    probe = dict(full)
    for key in ("images", "images2", "frames"):
        if key in probe:
            b, p, h, w, c = probe[key].shape
            pw = w
            while pw > probe_width and pw % 2 == 0:
                pw //= 2
            probe[key] = jnp.zeros((b, p, h, pw, c), jnp.float32)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is None:
        variables = model.init(rngs, probe, train=False)
    else:
        with jax.default_device(cpu):
            variables = model.init(rngs, probe, train=False)

    got = jax.tree_util.tree_map(lambda x: (x.shape, np.dtype(x.dtype)), variables)
    want = jax.tree_util.tree_map(lambda x: (x.shape, np.dtype(x.dtype)), expected)
    if got != want:  # spatial-size-dependent params somewhere: be exact
        return init_model(cfg, rng, batch_size, axis_name)
    return model, variables


def factorize_stem_variables(variables, channels_per_frame: int):
    """Classic-stem PointSeg variables -> factorized-stem layout.

    The classic stem kernel [kh, kw, 2C, F] splits by input-channel half
    into the factorized conv's [kh, kw, C, 2F] (first half -> output
    channels [0:F], second -> [F:2F]); a classic bias b becomes
    concat([b, 0]) so the pair-sum adds it exactly once. BatchNorm
    params/stats transfer unchanged. Used to port classic checkpoints
    (including torch imports, models/import_torch.py) onto a factorized
    config; numerical parity is tested in tests/unit/test_models.py.
    """
    import numpy as np

    def rewrite(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k == "encoder" and isinstance(v, dict) and "ConvBN_0" in v:
                enc = dict(v)
                stem = enc.pop("ConvBN_0")
                fs = {}
                if "Conv_0" in stem:
                    conv = dict(stem["Conv_0"])
                    kern = np.asarray(conv["kernel"])
                    C = channels_per_frame
                    if kern.shape[2] != 2 * C:
                        raise ValueError(
                            f"stem kernel has {kern.shape[2]} input channels,"
                            f" expected 2*{C}")
                    conv["kernel"] = jnp.concatenate(
                        [jnp.asarray(kern[:, :, :C]),
                         jnp.asarray(kern[:, :, C:])], axis=-1)
                    if "bias" in conv:
                        b = jnp.asarray(conv["bias"])
                        conv["bias"] = jnp.concatenate(
                            [b, jnp.zeros_like(b)])
                    fs["Conv_0"] = conv
                if "BatchNorm_0" in stem:
                    fs["BatchNorm_0"] = stem["BatchNorm_0"]
                enc["FactorizedStem_0"] = fs
                out[k] = {kk: rewrite(vv) for kk, vv in enc.items()}
            else:
                out[k] = rewrite(v)
        return out

    return rewrite(dict(variables))
