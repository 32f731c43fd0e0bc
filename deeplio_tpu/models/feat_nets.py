"""Feature nets: LiDAR towers, IMU encoders, fusion, odometry nets, heads.

Reference components rebuilt (SURVEY.md §2.3):
  * ``LidarPointSegFeat`` / ``LidarSimpleFeat0`` / ``LidarSimpleFeat1``
    (``deeplio/models/nets/lidar_feat_nets.py``)
  * ``ImuFeatRnn0`` / ``ImuFeatFC`` (``imu_feat_nets.py``)
  * ``DeepLIOFusionLayer`` soft/hard (``fusion_nets.py``)
  * ``OdomFeatRNN`` / ``OdomFeatFC`` (``odom_feat_nets.py``)
  * twin translation/rotation regression heads (``deeplio_nets.py``)

All nets consume pair-stacked range images [B*P, H, W, 2C] (frames i and j
channel-concatenated) and emit flat features; temporal structure across the
P pairs of a window is handled by the odometry net. Shape derivation from
config happens at trace time — flax infers every layer's input width, which
replaces the reference's BaseNet output-shape bookkeeping (SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplio_tpu.models.blocks import ConvBN
from deeplio_tpu.models.pointseg import PointSegNet
from deeplio_tpu.ops.rnn import MaskedRNN


class LidarPointSegFeat(nn.Module):
    """PointSeg encoder over stacked frame pairs -> flat feature.

    part="encoder" uses the bottleneck map; "encoder+decoder" (the
    reference's bypass mode) runs the decoder too and pools its output.
    The bottleneck map is reduced by strided convs then flattened through a
    Dense to ``feature_size``.
    """

    feature_size: int = 512
    part: str = "encoder"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    h_stride: int = 1
    w_stride: int = 2
    se: bool = True
    el_squeeze: int = 0
    stem: str = "classic"
    combos: tuple = ()  # factorized-stem pairs (stem="factorized" only)
    fire: str = "classic"
    pool: str = "classic"

    @nn.compact
    def __call__(self, x, train: bool = True):
        net = PointSegNet(part=self.part, dtype=self.dtype,
                          axis_name=self.axis_name, with_se=self.se,
                          h_stride=self.h_stride, w_stride=self.w_stride,
                          el_squeeze=self.el_squeeze,
                          stem=self.stem, combos=self.combos,
                          fire=self.fire, pool=self.pool,
                          name="pointseg")
        feat = net(x, train)                     # [B, H, W', C']
        # Reduce: two strided convs then spatial mean -> Dense.
        feat = ConvBN(256, (3, 3), (2, 2), dtype=self.dtype,
                      axis_name=self.axis_name)(feat, train)
        feat = ConvBN(256, (3, 3), (2, 2), dtype=self.dtype,
                      axis_name=self.axis_name)(feat, train)
        feat = jnp.mean(feat, axis=(-3, -2))     # [B, 256]
        feat = nn.Dense(self.feature_size, dtype=self.dtype)(feat)
        feat = nn.relu(feat)
        if self.dropout > 0:
            feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        return feat


class LidarSimpleFeat0(nn.Module):
    """Plain strided conv tower (the reference's simple-conv variant 0)."""

    feature_size: int = 256
    base_channels: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.base_channels
        # Width-biased early strides, then square strides.
        for i, (k, s) in enumerate([((3, 7), (1, 2)), ((3, 5), (1, 2)),
                                    ((3, 3), (2, 2)), ((3, 3), (2, 2)),
                                    ((3, 3), (2, 2))]):
            x = ConvBN(min(c * (2 ** i), 256), k, s, dtype=self.dtype,
                       axis_name=self.axis_name)(x, train)
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dense(self.feature_size, dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class LidarSimpleFeat1(nn.Module):
    """Deeper simple tower (variant 1): residual pairs between stride steps."""

    feature_size: int = 256
    base_channels: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.base_channels
        for i in range(4):
            ch = min(c * (2 ** i), 256)
            x = ConvBN(ch, (3, 3), (1, 2) if i < 2 else (2, 2),
                       dtype=self.dtype, axis_name=self.axis_name)(x, train)
            h = ConvBN(ch, (3, 3), (1, 1), dtype=self.dtype,
                       axis_name=self.axis_name)(x, train)
            x = x + h
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dense(self.feature_size, dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ImuFeatRnn(nn.Module):
    """LSTM/GRU over each pair's padded IMU window (reference ImuFeatRnn0)."""

    hidden_size: int = 128
    num_layers: int = 2
    cell: str = "lstm"
    bidirectional: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imu, mask, train: bool = True):
        """imu: [B, T, 6]; mask: [B, T] -> [B, H*dirs]."""
        _, final = MaskedRNN(self.hidden_size, self.num_layers, self.cell,
                             self.bidirectional, self.dtype)(imu, mask)
        return final


class ImuFeatFC(nn.Module):
    """Flatten+MLP IMU encoder (reference ImuFeatFC). Masked samples are
    zeroed so padding cannot leak."""

    hidden_size: int = 128
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imu, mask, train: bool = True):
        x = (imu * mask[..., None]).reshape(imu.shape[0], -1)
        for _ in range(self.num_layers):
            x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class FusionLayer(nn.Module):
    """Soft/hard sensor fusion (reference DeepLIOFusionLayer).

    hard: concat(lidar, imu). soft: learned sigmoid masks gate each
    modality before concat ("Selective Sensor Fusion" style).
    """

    kind: str = "soft"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, lidar_feat, imu_feat, train: bool = True):
        both = jnp.concatenate([lidar_feat, imu_feat], axis=-1)
        if self.kind == "hard":
            return both
        gate_l = jax.nn.sigmoid(
            nn.Dense(lidar_feat.shape[-1], dtype=self.dtype, name="gate_lidar")(both))
        gate_i = jax.nn.sigmoid(
            nn.Dense(imu_feat.shape[-1], dtype=self.dtype, name="gate_imu")(both))
        return jnp.concatenate([lidar_feat * gate_l, imu_feat * gate_i], axis=-1)


class OdomFeatRNN(nn.Module):
    """Temporal integration across the window's pair sequence (LSTM/GRU)."""

    hidden_size: int = 256
    num_layers: int = 2
    cell: str = "lstm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, P, F] -> [B, P, H] (per-pair outputs, causal over pairs)."""
        outs, _ = MaskedRNN(self.hidden_size, self.num_layers, self.cell,
                            dtype=self.dtype)(x, None)
        return outs


class OdomFeatFC(nn.Module):
    """Per-pair MLP alternative (no cross-pair recurrence)."""

    hidden_size: int = 256
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.num_layers):
            x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class PoseHeads(nn.Module):
    """Twin regression heads: translation R^3 and unit quaternion R^4.

    Rotation output is normalized; the raw 4-vector initialises near
    identity (bias [1,0,0,0]) so early training stays on-manifold.
    """

    hidden: int = 128
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        hx = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="x_fc")(x))
        hq = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="q_fc")(x))
        x_out = nn.Dense(3, dtype=jnp.float32, name="x_out")(hx.astype(jnp.float32))
        q_raw = nn.Dense(
            4, dtype=jnp.float32, name="q_out",
            bias_init=lambda k, s, d=jnp.float32: jnp.asarray([1.0, 0, 0, 0], d),
        )(hq.astype(jnp.float32))
        q_out = q_raw / jnp.maximum(
            jnp.linalg.norm(q_raw, axis=-1, keepdims=True), 1e-8)
        return x_out, q_out
