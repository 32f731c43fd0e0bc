"""Projection backend shootout on the real chip.

Usage: python benchmarks/bench_projection.py [batch]
Measures scans/s for each backend at production scale (131072 points ->
64x1024), honest sync rules from utils/timing.py (distinct input buffers,
scalar-reduced outputs, device_get sync).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.data.synthetic import synthetic_ring_batch
from deeplio_tpu.ops import projection as proj
from deeplio_tpu.ops import projection_pallas_ring as _ppr

H, W, FU, FD = 64, 1024, 3.0, -25.0
N = 131072


def ring_cloud_batch(rng, b, n):
    return synthetic_ring_batch(rng, b, n, rings=H, fov_up_deg=FU,
                                fov_down_deg=FD)


def measure(fn, inputs, iters=20, warmup=3):
    out = None
    for i in range(warmup):
        out = fn(*inputs[i % len(inputs)])
    float(jax.device_get(out))
    t0 = time.time()
    for i in range(iters):
        out = fn(*inputs[i % len(inputs)])
    float(jax.device_get(out))
    return (time.time() - t0) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    inputs = []
    for s in range(3):
        pts = ring_cloud_batch(rng, b, N)
        valid = rng.uniform(size=(b, N)) > 0.02
        inputs.append((jax.device_put(jnp.asarray(pts)),
                       jax.device_put(jnp.asarray(valid))))

    def reduce(img, mask):
        return (img.sum() + mask.sum()).astype(jnp.float32)

    backends = {
        "sort-sentinel-packed": lambda p, v: reduce(
            *proj.project_batch(p, v, H, W, FU, FD, packed=True)),
        "sort-sentinel-exact": lambda p, v: reduce(
            *proj.project_batch(p, v, H, W, FU, FD, packed=False)),
        "sort-free-gather": lambda p, v: reduce(
            *proj.project_batch_sorted(p, v, H, W, FU, FD, payload="gather")),
        "sort-free-carry": lambda p, v: reduce(
            *proj.project_batch_sorted(p, v, H, W, FU, FD, payload="carry")),
        "sort-free-carry-f16": lambda p, v: reduce(
            *proj.project_batch_sorted(p, v, H, W, FU, FD,
                                       payload="carry-f16")),
        "ring-gather": lambda p, v: reduce(
            *proj.project_batch_ring(p, v, H, W, FU, FD, payload="gather")),
        "ring-carry": lambda p, v: reduce(
            *proj.project_batch_ring(p, v, H, W, FU, FD, payload="carry")),
        "ring-carry-f16": lambda p, v: reduce(
            *proj.project_batch_ring(p, v, H, W, FU, FD, payload="carry-f16")),
    }
    if jax.default_backend() == "tpu":
        # The production Mosaic kernel + its lane-width sweep (the [R,
        # LANES] working view: wider lanes halve the sequential loop
        # counts, narrower ones shrink the per-roll vectors).
        for lanes in (1024, 2048, 4096):
            backends[f"pallas-ring-l{lanes}"] = (
                lambda p, v, l=lanes: reduce(
                    *_ppr.project_batch_ring_pallas(p, v, H, W, FU, FD,
                                                    lanes=l)))
        # packed routing word on/off at the default lane width (the
        # wrapper default is auto->on where the bit budget fits; the
        # FLAGSHIP pins it off until the full-step bench A/B adopts it —
        # see docs/performance.md).
        backends["pallas-ring-unpacked"] = lambda p, v: reduce(
            *_ppr.project_batch_ring_pallas(p, v, H, W, FU, FD,
                                            packed_route="off"))
        # scans-per-block sweep (fewer grid steps amortize per-step
        # overhead — the custom-call residual hypothesis).
        for spb in (2, 4):
            backends[f"pallas-ring-spb{spb}"] = (
                lambda p, v, s=spb: reduce(
                    *_ppr.project_batch_ring_pallas(p, v, H, W, FU, FD,
                                                    spb=s)))
    for name, fn in backends.items():
        jfn = jax.jit(fn)
        dt = measure(jfn, inputs)
        print(f"{name:24s} {b / dt:9.1f} scans/s   ({dt * 1e3 / b:6.3f} ms/scan)",
              flush=True)


if __name__ == "__main__":
    main()
