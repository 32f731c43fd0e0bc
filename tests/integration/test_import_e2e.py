"""End-to-end torch -> deeplio_tpu weight-porting proof (VERDICT r2 #7).

Builds a live torch model shaped exactly like the DeepLIO zoo (simple conv
tower + BN, IMU LSTM, soft fusion, odometry LSTM, twin pose heads), runs
the structural importer over its ``state_dict`` with identity naming, and
asserts FULL forward parity of the flax model against the torch forward —
the complete porting path (matcher + every layout converter + the zoo's
consumption of the imported tree), not just per-layer layout math.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.config import load_config_dict
from deeplio_tpu.models import import_torch as it
from deeplio_tpu.models import init_model

torch = pytest.importorskip("torch")
F = torch.nn.functional

H_IMG, W_IMG, C_IMG = 8, 32, 5
# LidarSimpleFeat0's tower spec (models/feat_nets.py): kernel, stride.
TOWER = [((3, 7), (1, 2)), ((3, 5), (1, 2)), ((3, 3), (2, 2)),
         ((3, 3), (2, 2)), ((3, 3), (2, 2))]
BASE = 8
FEAT = 32
IMU_H, ODOM_H = 16, 24


def _cfg():
    return load_config_dict({
        "arch": "deeplio",
        "compute-dtype": "float32",
        "datasets": {
            "sequence-size": 3,
            "combinations": [[0, 1], [1, 2]],
            "channels": ["x", "y", "z", "remission", "depth"],
            "image-height": H_IMG, "image-width": W_IMG,
            "max-imu-per-pair": 6,
        },
        "deeplio": {
            "dropout": 0.0,
            "lidar-feat-net": {"name": "lidar-feat-simple-0"},
            "imu-feat-net": {"name": "imu-feat-rnn"},
            "fusion-net": {"type": "soft"},
            "odom-feat-net": {"name": "odom-feat-rnn"},
        },
        "lidar-feat-simple-0": {"feature-size": FEAT, "base-channels": BASE,
                                "dropout": 0.0},
        "imu-feat-rnn": {"type": "lstm", "hidden-size": IMU_H,
                         "num-layers": 2},
        "odom-feat-rnn": {"type": "lstm", "hidden-size": ODOM_H,
                          "num-layers": 1},
        "losses": {"active": "hws"},
    })


def _same_pads(i, k, s):
    o = -(-i // s)
    tot = max((o - 1) * s + k - i, 0)
    return tot // 2, tot - tot // 2


class _Holder(torch.nn.Module):
    pass


def _build_torch_deeplio():
    """Torch modules named to mirror the flax zoo's param paths exactly
    (identity name_map: flax path tuple -> dotted torch module name)."""
    root = _Holder()

    lidar = _Holder()
    c_in = 2 * C_IMG
    for idx, ((kh, kw), _) in enumerate(TOWER):
        c_out = min(BASE * (2 ** idx), 256)
        blk = _Holder()
        blk.Conv_0 = torch.nn.Conv2d(c_in, c_out, (kh, kw), bias=False)
        blk.BatchNorm_0 = torch.nn.BatchNorm2d(c_out)
        setattr(lidar, f"ConvBN_{idx}", blk)
        c_in = c_out
    lidar.Dense_0 = torch.nn.Linear(c_in, FEAT)
    root.lidar_feat = lidar

    imu = _Holder()
    imu.MaskedRNN_0 = torch.nn.LSTM(6, IMU_H, num_layers=2, batch_first=True)
    root.imu_feat = imu

    fusion = _Holder()
    fusion.gate_lidar = torch.nn.Linear(FEAT + IMU_H, FEAT)
    fusion.gate_imu = torch.nn.Linear(FEAT + IMU_H, IMU_H)
    root.fusion = fusion

    odom = _Holder()
    odom.MaskedRNN_0 = torch.nn.LSTM(FEAT + IMU_H, ODOM_H, num_layers=1,
                                     batch_first=True)
    root.odom_feat = odom

    heads = _Holder()
    heads.x_fc = torch.nn.Linear(ODOM_H, 128)
    heads.q_fc = torch.nn.Linear(ODOM_H, 128)
    heads.x_out = torch.nn.Linear(128, 3)
    heads.q_out = torch.nn.Linear(128, 4)
    root.heads = heads
    return root


def _torch_forward(tm, images, imu):
    """Replicates DeepLIO.__call__ (train=False) in torch semantics,
    including flax's SAME padding (asymmetric for strided layers)."""
    B, P = images.shape[:2]
    x = torch.tensor(images.reshape((B * P,) + images.shape[2:]))
    x = x.permute(0, 3, 1, 2)                       # NHWC -> NCHW
    for idx, ((kh, kw), (sh, sw)) in enumerate(TOWER):
        blk = getattr(tm.lidar_feat, f"ConvBN_{idx}")
        ph = _same_pads(x.shape[2], kh, sh)
        pw = _same_pads(x.shape[3], kw, sw)
        x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]))
        x = F.conv2d(x, blk.Conv_0.weight, stride=(sh, sw))
        x = blk.BatchNorm_0(x)
        x = F.relu(x)
    feat = x.mean(dim=(2, 3))
    feat = F.relu(tm.lidar_feat.Dense_0(feat))      # [B*P, FEAT]

    seq = torch.tensor(imu.reshape((B * P,) + imu.shape[2:]))
    _, (h, _) = tm.imu_feat.MaskedRNN_0(seq)
    imu_f = h[-1]                                   # [B*P, IMU_H]

    both = torch.cat([feat, imu_f], dim=-1)
    gl = torch.sigmoid(tm.fusion.gate_lidar(both))
    gi = torch.sigmoid(tm.fusion.gate_imu(both))
    fused = torch.cat([feat * gl, imu_f * gi], dim=-1).reshape(B, P, -1)

    outs, _ = tm.odom_feat.MaskedRNN_0(fused)       # [B, P, ODOM_H]
    flat = outs.reshape(B * P, -1)
    hx = F.relu(tm.heads.x_fc(flat))
    hq = F.relu(tm.heads.q_fc(flat))
    x_out = tm.heads.x_out(hx)
    q_raw = tm.heads.q_out(hq)
    q_out = q_raw / q_raw.norm(dim=-1, keepdim=True).clamp_min(1e-8)
    return (x_out.reshape(B, P, 3).detach().numpy(),
            q_out.reshape(B, P, 4).detach().numpy())


def test_full_deeplio_import_forward_parity():
    cfg = _cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tm = _build_torch_deeplio()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    tm.eval()

    params, stats = it.import_state_dict(
        tm.state_dict(), variables["params"], variables["batch_stats"])

    rng = np.random.default_rng(0)
    B, P, T = 2, 2, 6
    images = rng.normal(size=(B, P, H_IMG, W_IMG, 2 * C_IMG)) \
        .astype(np.float32)
    imu = rng.normal(size=(B, P, T, 6)).astype(np.float32)
    batch = {"images": jnp.asarray(images), "imu": jnp.asarray(imu),
             "imu_mask": jnp.ones((B, P, T), jnp.float32)}

    with torch.no_grad():
        tx, tq = _torch_forward(tm, images, imu)
    fx, fq = model.apply(
        {"params": it.as_jax(params), "batch_stats": it.as_jax(stats)},
        batch, train=False)

    np.testing.assert_allclose(np.asarray(fx), tx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fq), tq, atol=1e-5)
