"""Epoch-level projection cache: prefill, serving, and step equivalence
(docs/performance.md roadmap item 3; VERDICT r1 next-round #8)."""

import dataclasses

import jax
import numpy as np
import pytest
import yaml

from deeplio_tpu.config import load_config, load_config_dict
from deeplio_tpu.config.schema import ConfigError
from deeplio_tpu.data.dataset import WindowDataset, build_drives
from deeplio_tpu.data.proj_cache import ProjectionCache, fingerprint
from deeplio_tpu.ops.projection import make_projector

# Heavy end-to-end/parity module: excluded from the fast inner loop
# (`pytest -m "not slow"`); full suite runs everything.
pytestmark = pytest.mark.slow


def _cfg():
    cfg = load_config("configs/deeplo_synth.yaml")
    proj = dataclasses.replace(cfg.datasets.projection, height=16, width=128,
                               max_points=2048)
    ds = dataclasses.replace(cfg.datasets, projection=proj,
                             synthetic_frames=10)
    return cfg.replace(datasets=ds)


class TestCache:
    def test_prefill_and_bitwise_serving(self, tmp_path):
        cfg = _cfg()
        drives = build_drives(cfg, "train")
        cache = ProjectionCache(str(tmp_path), cfg.datasets)
        cache.ensure(drives, batch=4)

        ds_cfg = cfg.datasets
        projector = jax.jit(make_projector(ds_cfg.projection, ds_cfg.channels,
                                           ds_cfg.mean, ds_cfg.std))
        d = drives[0]
        pts, vld = zip(*[d.points(i) for i in range(3)])
        img, _ = projector(np.stack(pts), np.stack(vld))
        want = np.asarray(jax.device_get(img), np.float16)
        got = np.asarray(cache.images(d, 0, 3))
        np.testing.assert_array_equal(got, want)

    def test_dataset_serves_images_not_points(self, tmp_path):
        cfg = _cfg()
        drives = build_drives(cfg, "train")
        cache = ProjectionCache(str(tmp_path), cfg.datasets)
        cache.ensure(drives, batch=4)
        ds = WindowDataset(cfg.datasets, drives, with_points=True,
                           image_cache=cache)
        item = ds.get(0)
        assert "points_x" not in item and "images" in item
        S = cfg.datasets.sequence_size
        p = cfg.datasets.projection
        assert item["images"].shape == (
            S, p.height, p.width, cfg.datasets.num_image_channels)
        assert item["images"].dtype == np.float16

    def test_fingerprint_changes_with_geometry(self):
        cfg = _cfg().datasets
        other = dataclasses.replace(
            cfg, projection=dataclasses.replace(cfg.projection, width=256))
        assert fingerprint(cfg) != fingerprint(other)

    def test_subrange_drives_get_distinct_files(self, tmp_path):
        cfg = _cfg()
        cache = ProjectionCache(str(tmp_path), cfg.datasets)

        class Stub:
            name = "d"

            def __init__(self, start, n):
                self.start = start
                self._n = n

            def __len__(self):
                return self._n

        assert cache._path(Stub(0, 5)) != cache._path(Stub(5, 5))

    def test_cached_step_matches_uncached(self, tmp_path):
        """Training on cached images must equal training on raw points up
        to the cache's f16 storage rounding."""
        from deeplio_tpu.losses import init_loss_params
        from deeplio_tpu.models import init_model
        from deeplio_tpu.parallel import make_mesh, replicate, shard_batch
        from deeplio_tpu.train import (build_train_step, create_train_state,
                                       make_optimizer)

        cfg = _cfg()
        drives = build_drives(cfg, "train")
        cache = ProjectionCache(str(tmp_path), cfg.datasets)
        cache.ensure(drives, batch=4)

        mesh = make_mesh(data=2, devices=jax.devices()[:2])
        tx = make_optimizer(cfg.optim, 10)
        model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                      axis_name="data")
        train_step, _ = build_train_step(cfg, model, tx, mesh)

        # Host copy: train_step donates its state, and replicate() can be a
        # no-op device_put that would let donation delete `variables`.
        host_vars = jax.device_get(variables)

        def one_step(ds):
            state = create_train_state(host_vars, init_loss_params(cfg.loss),
                                       tx, jax.random.PRNGKey(1))
            state = replicate(mesh, state)
            batch = next(iter(ds.iter_batches(2, shuffle=False, workers=1)))
            batch.pop("meta", None)
            state, m = train_step(state, shard_batch(mesh, batch))
            return float(jax.device_get(m["loss"]))

        raw_ds = WindowDataset(cfg.datasets, drives, with_points=True)
        img_ds = WindowDataset(cfg.datasets, drives, with_points=True,
                               image_cache=cache)
        l_raw = one_step(raw_ds)
        l_img = one_step(img_ds)
        assert l_img == pytest.approx(l_raw, rel=2e-2)

    def test_waiter_fails_fast_when_primary_dies(self, tmp_path, monkeypatch):
        """A non-primary process must not block for the full timeout when
        the primary's build heartbeat is absent/stale (VERDICT r2 weak #6)."""
        import time

        cfg = _cfg()
        cache = ProjectionCache(str(tmp_path), cfg.datasets)
        monkeypatch.setattr(jax, "process_index", lambda: 1)

        class Stub:
            name = "dead"
            start = 0

            def __len__(self):
                return 5

        t0 = time.time()
        with pytest.raises(RuntimeError, match="heartbeat went stale"):
            cache.ensure([Stub()], timeout_s=3600.0, stall_s=1.0)
        assert time.time() - t0 < 30.0  # fail-fast, not the 1 h timeout

    def test_waiter_survives_on_fresh_heartbeat(self, tmp_path, monkeypatch):
        """A fresh heartbeat keeps the waiter alive until the file lands."""
        import threading
        import time

        cfg = _cfg()
        cache = ProjectionCache(str(tmp_path), cfg.datasets)
        monkeypatch.setattr(jax, "process_index", lambda: 1)

        class Stub:
            name = "slow"
            start = 0

            def __len__(self):
                return 5

        stub = Stub()

        def primary():
            # Simulated primary: heartbeat while "building", then deliver.
            for _ in range(4):
                with open(cache._heartbeat(), "w") as f:
                    f.write("alive")
                time.sleep(0.5)
            np.save(cache._path(stub), np.zeros((1,), np.float16))

        th = threading.Thread(target=primary)
        th.start()
        try:
            cache.ensure([stub], timeout_s=30.0, stall_s=1.5)
        finally:
            th.join()

    def test_cache_plus_augment_is_config_error(self):
        with pytest.raises(ConfigError, match="cache-projections"):
            load_config_dict(yaml.safe_load("""
arch: deeplo
datasets:
  synthetic: true
  sequence-size: 2
  augment-yaw: true
  channels: [x, y, z, remission, depth]
deeplo:
  lidar-feat-net: {name: lidar-feat-simple-0}
  odom-feat-net: {name: odom-feat-fc}
losses: {active: hws}
optimizer: {name: adam, lr: 0.001}
train: {cache-projections: true}
"""))
