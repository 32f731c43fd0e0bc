"""Coverage for secondary paths: streaming CLI, pointseg decoder part,
prefetcher error propagation, profiler flag."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from deeplio_tpu.cli import stream as stream_cli
from deeplio_tpu.cli import train as train_cli

pytestmark = [pytest.mark.integration, pytest.mark.slow]


def _tiny_yaml(tmp_path, **ds_over):
    import yaml
    d = yaml.safe_load(open("configs/deeplo_synth.yaml"))
    d["compute-dtype"] = "float32"
    d["datasets"].update({
        "image-height": 16, "image-width": 128, "max-points": 2048,
        "synthetic-frames": 14, "sequence-size": 2,
    })
    d["datasets"].update(ds_over)
    d["train"].update({"batch-size": 8, "epochs": 1, "log-every": 2,
                       "checkpoint-every-steps": 5})
    p = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(d, open(p, "w"))
    return p


def test_stream_cli_end_to_end(tmp_path):
    cfg = _tiny_yaml(tmp_path)
    wd = str(tmp_path / "run")
    train_cli.main(["-c", cfg, "--workdir", wd])
    stream_cli.main(["-c", cfg, "--workdir", wd, "--chunk", "8"])
    scores = json.load(open(os.path.join(wd, "stream", "scores.json")))
    (name, s), = scores.items()
    assert s["frames"] == 14
    assert np.isfinite(s["ate_m"])
    assert s["frames_per_sec"] > 0
    assert os.path.exists(os.path.join(wd, "stream", f"{name}_stream.txt"))


def test_pointseg_decoder_part_variant():
    from deeplio_tpu.config import load_config_dict
    from deeplio_tpu.models import init_model, example_batch
    cfg = load_config_dict({
        "arch": "deeplo",
        "compute-dtype": "float32",
        "datasets": {"image-height": 16, "image-width": 128,
                     "max-points": 1024, "sequence-size": 2},
        "deeplo": {"lidar-feat-net": "lidar-feat-pointseg"},
        "lidar-feat-pointseg": {"part": "encoder+decoder", "feature-size": 32},
    })
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    x, q = model.apply(variables, example_batch(cfg, 1), train=False)
    assert x.shape == (1, 1, 3)


def test_prefetcher_propagates_worker_errors():
    from deeplio_tpu.data.pipeline import DevicePrefetcher
    from deeplio_tpu.parallel import make_mesh

    def bad_iter():
        yield {"x": np.zeros((8, 2), np.float32)}
        raise RuntimeError("boom in loader")

    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    it = DevicePrefetcher(bad_iter(), mesh, depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom in loader"):
        for _ in it:
            pass


def test_prefetcher_default_gbs_skips_flat_plane_keys(monkeypatch):
    """The default global-batch-size derivation must come from a
    WINDOW-level key: flat plane keys carry B*S rows, and deriving from
    one of those makes every window-level key fail make_global_batch's
    per-key divisibility check (found in review; the dict's first key IS
    a plane key under the loader's collate order)."""
    import deeplio_tpu.data.pipeline as pipeline_mod
    import deeplio_tpu.parallel.multihost as mh
    from deeplio_tpu.data.pipeline import DevicePrefetcher
    from deeplio_tpu.parallel import make_mesh

    seen = {}

    def fake_global(sharding, batch, gbs):
        seen["gbs"] = gbs
        return batch

    monkeypatch.setattr(mh, "make_global_batch", fake_global)
    monkeypatch.setattr(pipeline_mod.jax, "process_count", lambda: 2)

    B, S, N = 4, 3, 16
    def one_batch():
        yield {
            "points_x": np.zeros((B * S, N), np.float32),   # flat: B*S rows
            "x_gt": np.zeros((B, 1, 3), np.float32),        # window-level
            "imu": np.zeros((B, 1, 8, 6), np.float32),
        }

    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    it = DevicePrefetcher(one_batch(), mesh, depth=1)
    next(it)
    assert seen["gbs"] == B * 2  # window rows x process_count, NOT B*S*2


def test_profile_flag_writes_trace(tmp_path):
    cfg = _tiny_yaml(tmp_path)
    wd = str(tmp_path / "runp")
    train_cli.main(["-c", cfg, "--workdir", wd, "--profile-steps", "2",
                    "--epochs", "1"])
    prof = os.path.join(wd, "profile")
    assert os.path.isdir(prof) and len(os.listdir(prof)) > 0


def test_eval_covers_all_pairs_with_training_stride(tmp_path):
    """Regression: predict_drive must use stride-1 windows even when the
    training config strides windows (tuned configs use stride S-1)."""
    cfg_p = _tiny_yaml(tmp_path, **{"sequence-size": 3, "window-stride": 2})
    wd = str(tmp_path / "run")
    train_cli.main(["-c", cfg_p, "--workdir", wd])

    from deeplio_tpu.cli import test as test_cli
    test_cli.main(["-c", cfg_p, "--workdir", wd, "--split", "test"])
    scores = json.load(open(os.path.join(wd, "eval", "scores.json")))
    (name, s), = scores.items()
    assert np.isfinite(s["ate_m"])
