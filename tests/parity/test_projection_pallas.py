"""Pallas projection backend parity (interpret mode on CPU; on TPU the
same kernel was verified bit-identical to the packed sort path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from deeplio_tpu.ops import projection as proj
from deeplio_tpu.ops import projection_pallas as pp

# Heavy end-to-end/parity module: excluded from the fast inner loop
# (`pytest -m "not slow"`); full suite runs everything.
pytestmark = pytest.mark.slow

H, W = 16, 128  # small: interpret mode is slow
N = 2048


def _cloud(seed, n_valid=None):
    rng = np.random.default_rng(seed)
    m = N if n_valid is None else n_valid
    pts = np.zeros((N, 4), np.float32)
    rr = rng.uniform(2.0, 70.0, m)
    yaw = rng.uniform(-np.pi, np.pi, m)
    pitch = rng.uniform(np.deg2rad(-25.0), np.deg2rad(3.0), m)
    pts[:m, 0] = rr * np.cos(pitch) * np.cos(yaw)
    pts[:m, 1] = rr * np.cos(pitch) * np.sin(yaw)
    pts[:m, 2] = rr * np.sin(pitch)
    pts[:m, 3] = rng.uniform(0, 1, m)
    valid = np.zeros(N, bool)
    valid[:m] = True
    return pts, valid


@pytest.mark.parametrize("seed,n_valid", [(0, None), (1, 1500)])
def test_pallas_matches_packed_sort(monkeypatch, seed, n_valid):
    monkeypatch.setattr(pp, "CHUNK", 512)
    pts, valid = _cloud(seed, n_valid)
    with pltpu.force_tpu_interpret_mode():
        ip, mp = pp.project_batch_pallas(
            jnp.asarray(pts)[None], jnp.asarray(valid)[None], H, W, 3.0, -25.0)
    ie, me = proj.project_batch(
        jnp.asarray(pts)[None], jnp.asarray(valid)[None], H, W, 3.0, -25.0,
        packed=True)
    np.testing.assert_array_equal(np.asarray(mp), np.asarray(me))
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ie), atol=1e-4)
