"""Streaming odometry (BASELINE config 5): compiled lax.scan loop over a
synthetic drive, trajectory consistency with the batch evaluator."""

import dataclasses

import jax
import numpy as np
import pytest

from deeplio_tpu.config import load_config
from deeplio_tpu.data.drives import SyntheticDrive
from deeplio_tpu.eval import StreamingOdometry, chain_relative_np
from deeplio_tpu.losses import init_loss_params
from deeplio_tpu.models import init_model

pytestmark = [pytest.mark.integration, pytest.mark.slow]


def _tiny_cfg(arch="deeplio"):
    cfg = load_config("configs/deeplio_synth.yaml")
    proj = dataclasses.replace(cfg.datasets.projection, height=16, width=128,
                               max_points=2048)
    ds = dataclasses.replace(cfg.datasets, projection=proj, synthetic_frames=20,
                             sequence_size=2, combinations=((0, 1),))
    cfg = cfg.replace(datasets=ds)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, arch=arch, compute_dtype="float32", dropout=0.0))
    raw = dict(cfg.raw)
    return cfg


def test_streaming_runs_and_chains():
    cfg = _tiny_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    drive = SyntheticDrive(n_frames=20, max_points=2048, seed=5)
    so = StreamingOdometry(cfg, model, variables, chunk=8)
    poses, dx, dq = so.run(drive)
    assert poses.shape == (20, 4, 4)
    assert np.isfinite(poses).all()
    # First tick must be identity motion.
    np.testing.assert_allclose(dx[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(dq[0], [1, 0, 0, 0], atol=1e-6)
    # Chaining the emitted relatives reproduces the carried poses.
    re = chain_relative_np(dx[1:].astype(np.float64), dq[1:].astype(np.float64))
    np.testing.assert_allclose(re[-1][:3, 3], poses[-1][:3, 3], atol=1e-3)


def test_streaming_pair_split_stem_matches_classic():
    """The flagship pins stem=pair-split; streaming must feed it (round-5
    stream-stage regression: KeyError 'images2') and — since the split
    conv is an exact rewrite of the classic stem with an IDENTICAL param
    tree — produce the classic stem's trajectory."""
    cfg = _tiny_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    cfg_ps = cfg.replace(model=dataclasses.replace(
        cfg.model, lidar=dataclasses.replace(cfg.model.lidar,
                                             stem="pair-split")))
    model_ps, _ = init_model(cfg_ps, jax.random.PRNGKey(0))
    drive = SyntheticDrive(n_frames=12, max_points=2048, seed=7)
    p1, dx1, dq1 = StreamingOdometry(cfg, model, variables, chunk=4).run(drive)
    p2, dx2, dq2 = StreamingOdometry(cfg_ps, model_ps, variables,
                                     chunk=4).run(drive)
    np.testing.assert_allclose(dx1, dx2, atol=1e-5)
    np.testing.assert_allclose(dq1, dq2, atol=1e-6)


def test_streaming_chunk_invariance():
    """Chunk size is an implementation detail: results must not change."""
    cfg = _tiny_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    drive = SyntheticDrive(n_frames=19, max_points=2048, seed=6)
    p1, dx1, dq1 = StreamingOdometry(cfg, model, variables, chunk=4).run(drive)
    p2, dx2, dq2 = StreamingOdometry(cfg, model, variables, chunk=16).run(drive)
    np.testing.assert_allclose(dx1, dx2, atol=1e-5)
    np.testing.assert_allclose(p1, p2, atol=1e-4)
