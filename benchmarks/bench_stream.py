"""Streaming odometry real-time factor at FULL KITTI scan scale.

VERDICT round-1 flagged that the streaming demo was only measured at
16k-point scans; this bench runs the compiled streaming loop
(eval/streaming.py) on the flagship config — 131072-point scans, 64x1024
images, PointSeg tower, IMU LSTM — and reports frames/s vs the 10 Hz
Velodyne rate. Model weights are freshly initialized (throughput is
weight-independent). Run: python benchmarks/bench_stream.py [chunk]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from __graft_entry__ import _FLAGSHIP
from deeplio_tpu.config import load_config_dict
from deeplio_tpu.data.synthetic import synthetic_ring_batch
from deeplio_tpu.eval.streaming import StreamingOdometry
from deeplio_tpu.models import init_model

LIDAR_HZ = 10.0
N_FRAMES = 96


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = load_config_dict(yaml.safe_load(_FLAGSHIP))
    ds = cfg.datasets
    N = ds.projection.max_points
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=2)
    stream = StreamingOdometry(cfg, model, variables, chunk=chunk)

    rng = np.random.default_rng(0)
    T = ds.max_imu_per_pair

    def make_chunk(seed):
        r = np.random.default_rng(seed)
        pts = synthetic_ring_batch(r, chunk, N, rings=ds.projection.height,
                                   fov_up_deg=ds.projection.fov_up_deg,
                                   fov_down_deg=ds.projection.fov_down_deg)
        return {
            "points": pts,
            "valid": np.ones((chunk, N), bool),
            "imu": r.normal(size=(chunk, T, 6)).astype(np.float32),
            "imu_mask": np.ones((chunk, T), np.float32),
        }

    chunks = [{k: jax.device_put(jnp.asarray(v)) for k, v in make_chunk(s).items()}
              for s in range(3)]
    carry = stream.init_carry()
    # warmup/compile
    carry, outs = stream._chunk_fn(carry, chunks[0])
    float(jax.device_get(outs[0][0, 0, 0]))

    n_chunks = N_FRAMES // chunk
    t0 = time.time()
    for i in range(n_chunks):
        carry, outs = stream._chunk_fn(carry, chunks[i % 3])
    float(jax.device_get(outs[0][-1, 0, 0]))
    dt = time.time() - t0
    fps = N_FRAMES / dt
    print(f"chunk={chunk}: {fps:6.1f} frames/s = {fps / LIDAR_HZ:4.1f}x "
          f"real-time at {N}-point scans (64x1024, flagship tower)")

    if "--budget" in sys.argv:
        # Per-tick component budget (VERDICT r2 item 9): device op time
        # bucketed from an xplane trace; the wall/device delta is the axon
        # relay dispatch overhead.
        import tempfile

        from xplane import bucket_ops, parse_trace

        ticks = 8
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for i in range(ticks):
                    carry, outs = stream._chunk_fn(carry, chunks[i % 3])
                float(jax.device_get(outs[0][-1, 0, 0]))
            ops, modules = parse_trace(td)
        dev_wall = sum(modules.values()) / ticks / chunk
        print(f"\nper-frame budget (chunk={chunk}, {ticks} traced ticks):")
        for k, us in sorted(bucket_ops(ops).items(), key=lambda kv: -kv[1]):
            print(f"  {k:16s} {us / ticks / chunk / 1e3:7.3f} ms")
        print(f"  {'device wall':16s} {dev_wall / 1e3:7.3f} ms")
        print(f"  {'host wall':16s} {dt / n_chunks / chunk * 1e3:7.3f} ms "
              f"(relay overhead = host - device)")
        top = sorted(ops.items(), key=lambda kv: -kv[1])[:12]
        print("top ops (ms/frame):")
        for name, us in top:
            print(f"  {us / ticks / chunk / 1e3:7.3f}  {name[:70]}")


if __name__ == "__main__":
    main()
