"""Config -> kernel threading of the Mosaic projection knobs.

The kernel-level semantics of kernel-spb / kernel-packed are parity-swept
in tests/parity/test_projection_pallas_ring.py; these tests pin the OTHER
half of the contract: that `datasets: {kernel-spb, kernel-packed}` in the
YAML actually reach the pallas-ring entry points through make_projector
(a silently dropped knob would make every A/B measurement a lie).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import deeplio_tpu.ops.projection as proj_mod
from deeplio_tpu.config.schema import ProjectionConfig
from deeplio_tpu.config import ConfigError, load_config_dict


def _capture_planes(monkeypatch):
    captured = {}

    def fake_planes(x, y, z, rem, valid, H, W, fu, fd, **kw):
        captured.update(kw)
        b, n = x.shape
        img = jnp.zeros((b, H, W, 5), jnp.float32)
        mask = jnp.zeros((b, H, W), jnp.float32)
        return img, mask

    import jax

    import deeplio_tpu.ops.projection_pallas_ring as ring_mod
    monkeypatch.setattr(ring_mod, "project_batch_ring_pallas_planes",
                        fake_planes)
    # The planes fast path only dispatches to Mosaic on a TPU backend;
    # fake it — the fake kernel never touches a device.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    return captured


@pytest.mark.parametrize("spb,packed", [(1, "off"), (2, "auto"), (4, "on")])
def test_knobs_reach_planes_kernel(monkeypatch, spb, packed):
    captured = _capture_planes(monkeypatch)
    cfg = ProjectionConfig(height=16, width=128, max_points=1024,
                           backend="pallas-ring", kernel_spb=spb,
                           kernel_packed=packed)
    fn = proj_mod.make_projector(cfg, ("x", "y", "z", "remission", "depth"),
                                 layout="planes")
    n = cfg.max_points
    planes = tuple(jnp.zeros((2, n), jnp.float32) for _ in range(4))
    fn(planes, jnp.ones((2, n), bool))
    assert captured["spb"] == spb
    assert captured["packed_route"] == packed


def test_kernel_packed_validated_at_load():
    d = {"arch": "deeplo",
         "datasets": {"synthetic": True, "kernel-packed": "banana"},
         "deeplo": {"lidar-feat-net": {"name": "lidar-feat-simple-0"}}}
    with pytest.raises(ConfigError, match="kernel-packed"):
        load_config_dict(d)


def test_kernel_packed_default_auto():
    assert ProjectionConfig().kernel_packed == "auto"
