"""Static bound on the packed-f16 projection route's input perturbation.

The production Mosaic kernel (and ``packed: true`` on every XLA backend)
carries x/y/z/remission as f16 pairs and reconstructs the depth channel
from the quantized range key (ops/projection.py::project_batch). Pixel
ASSIGNMENT is bit-identical to the exact route (same sort keys); only the
channel VALUES are rounded. This script measures that rounding where the
network sees it — after per-channel normalization — on both fixture
scales. Runs anywhere (CPU); complements the on-chip training A/B
(benchmarks/r4_onchip.sh) by bounding the input side analytically.

Usage: python benchmarks/quant_delta.py
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")
os.environ.setdefault("DEEPLIO_JAX_CACHE", "")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from deeplio_tpu.ops.projection import project_batch

CHANNELS = ("x", "y", "z", "rem", "depth")


def measure(pts: np.ndarray, valid: np.ndarray, H: int, W: int,
            std: tuple, label: str) -> None:
    f = jax.jit(lambda p, v, pk: project_batch(p, v, H, W, 3.0, -25.0,
                                               packed=pk),
                static_argnums=2)
    exact, m_e = (np.asarray(a) for a in f(pts, valid, False))
    quant, m_q = (np.asarray(a) for a in f(pts, valid, True))
    np.testing.assert_array_equal(m_e, m_q)  # identical pixel assignment
    occ = m_e.astype(bool)
    print(f"\n{label}: {pts.shape[1]} pts -> {H}x{W}, "
          f"{occ.mean():.1%} pixels occupied")
    print(f"{'chan':>5s} {'max|d|':>10s} {'rms d':>10s} "
          f"{'max|d|/std':>11s} {'rms d/std':>10s}")
    for c, name in enumerate(CHANNELS):
        d = (quant[..., c] - exact[..., c])[occ]
        mx, rms = np.abs(d).max(), float(np.sqrt(np.mean(d * d)))
        print(f"{name:>5s} {mx:10.4g} {rms:10.4g} "
              f"{mx / std[c]:11.2e} {rms / std[c]:10.2e}")


def main():
    rng = np.random.default_rng(0)

    # Gen-fixture scale (configs/deeplio_synth_gen2*.yaml): 16k-point
    # synthetic drive scans, std from the config's normalization table.
    from deeplio_tpu.data.drives import SyntheticDrive
    drv = SyntheticDrive(n_frames=4, max_points=16384, seed=0)
    pts = np.stack([drv.points(i)[0] for i in range(4)])
    vld = np.stack([drv.points(i)[1] for i in range(4)])
    measure(pts, vld, 64, 1024, (25.0, 25.0, 2.0, 0.3, 25.0), "gen fixture")

    # Flagship scale (__graft_entry__._FLAGSHIP): 131k-point ring scans,
    # flagship std table.
    from deeplio_tpu.data.synthetic import synthetic_ring_batch
    ring = synthetic_ring_batch(rng, 2, 131072, rings=64,
                                fov_up_deg=3.0, fov_down_deg=-25.0)
    measure(ring, np.ones(ring.shape[:2], bool), 64, 1024,
            (12.0, 12.0, 1.5, 0.16, 12.0), "flagship scale")


if __name__ == "__main__":
    main()
