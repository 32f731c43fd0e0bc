"""End-to-end INPUT-PIPELINE benchmark: host loader -> DevicePrefetcher ->
train step, host-fed batches at flagship scale (VERDICT r4 item 4).

bench.py stages device-resident buffers, so it measures the device step
alone; this harness answers the question bench.py cannot: can the HOST
side (scan synthesis/IO, slot binning, the halves layout, window
assembly, collate, device_put) actually feed the device at its measured
rate?  Three measurements:

1. ``slot-bin``   — slot_bin_scan host binning rate (the cold path every
   REAL scan pays once; data/synthetic.py::slot_bin_scan), single-thread
   and across the loader's thread pool.
2. ``loader``     — steady-state host batch assembly (warm scan caches:
   the per-epoch regime of training, where drives' lru caches hold the
   binned scans) in pairs/s-equivalent.
3. ``e2e``        — loader -> DevicePrefetcher -> jitted train step on
   the real chip, steady-state pairs/s/chip, directly comparable to
   bench.py's staged-batch number.

Usage:
    python benchmarks/bench_pipeline.py [--stages slot-bin,loader,e2e]
        [--batches 24] [--workers 8] [--spc 2] [--drives 8] [--frames 128]

The reference hides all of this in DataLoader(num_workers=N) worker
processes (SURVEY.md §3.1) and publishes no pipeline numbers; the honest
comparison is our own device demand (bench.py's pairs/s/chip).
"""

from __future__ import annotations

import argparse
import itertools
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from __graft_entry__ import _FLAGSHIP  # noqa: E402


def log(msg: str):
    print(f"[pipeline +{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


def flagship_cfg(drives: int, frames: int):
    from deeplio_tpu.config import load_config_dict

    d = yaml.safe_load(_FLAGSHIP)
    d["datasets"]["synthetic-train-drives"] = drives
    d["datasets"]["synthetic-frames"] = frames
    return load_config_dict(d)


def bench_slot_bin(cfg, iters: int = 40, workers: int = 8):
    """Cold-path binning rate: raw compacted ring scan -> slot grid."""
    from deeplio_tpu.data import synthetic as syn

    ds = cfg.datasets
    H, W = ds.projection.height, ds.projection.width
    N = ds.projection.max_points
    spp = N // (H * W)
    rng = np.random.default_rng(0)
    world = syn.synthetic_world(30000, seed=0)
    Ts, _ = syn.synthetic_trajectory(8, seed=0)
    scans = [syn.synthetic_scan(world, Ts[i % 8], N, seed=i)
             for i in range(8)]

    def bin_one(i):
        p, v = scans[i % len(scans)]
        return syn.slot_bin_scan(p, v, H, W, spp,
                                 ds.projection.fov_up_deg,
                                 ds.projection.fov_down_deg)

    bin_one(0)  # warm numpy
    t = time.time()
    for i in range(iters):
        bin_one(i)
    st_rate = iters / (time.time() - t)
    log(f"slot_bin_scan single-thread: {st_rate:.1f} scans/s "
        f"({1000 / st_rate:.2f} ms/scan, N={N}, {H}x{W}x{spp})")

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(bin_one, range(workers)))  # warm threads
        t = time.time()
        list(pool.map(bin_one, range(iters * workers)))
        mt_rate = iters * workers / (time.time() - t)
    log(f"slot_bin_scan x{workers} threads: {mt_rate:.1f} scans/s "
        f"(scaling {mt_rate / st_rate:.1f}x)")
    return {"slot_bin_scans_per_sec_1t": round(st_rate, 1),
            f"slot_bin_scans_per_sec_{workers}t": round(mt_rate, 1)}


def bench_relay(size_mb: int = 64):
    """Host->device transfer bandwidth (the axon relay on this rig; PCIe
    on a real TPU host) — the hard ceiling on any host-fed pipeline."""
    import jax

    buf = np.ones((size_mb * 1024 * 1024 // 4,), np.float32)
    dev = jax.devices()[0]
    t = time.time()
    x = jax.device_put(buf, dev)
    jax.block_until_ready(x)
    up = size_mb / (time.time() - t)
    t = time.time()
    jax.device_get(x)
    down = size_mb / (time.time() - t)
    log(f"relay H2D {up:.1f} MB/s, D2H {down:.1f} MB/s ({size_mb} MB probe)")
    return {"relay_h2d_mb_per_sec": round(up, 1),
            "relay_d2h_mb_per_sec": round(down, 1)}


def _epoch_stream(dataset, batch_size: int, workers: int):
    """Endless batch stream: chained shuffled epochs (distinct seeds)."""
    for epoch in itertools.count():
        yield from dataset.iter_batches(batch_size, shuffle=True,
                                        seed=epoch, workers=workers)


def bench_loader(cfg, dataset, batches: int, workers: int, batch_size: int):
    """Steady-state host assembly rate, warm scan caches."""
    P = cfg.datasets.num_pairs
    stream = _epoch_stream(dataset, batch_size, workers)
    # warm pass: fills every drive's scan lru cache (synthesis + binning
    # + layout run once per scan, like epoch 1 of a training run)
    n_warm = dataset.steps_per_epoch(batch_size)
    t = time.time()
    for _ in range(n_warm):
        next(stream)
    cold_rate = n_warm * batch_size * P / (time.time() - t)
    log(f"loader COLD (epoch 1: synth+bin+layout): {cold_rate:.1f} pairs/s "
        f"({n_warm} batches)")
    t = time.time()
    for _ in range(batches):
        next(stream)
    rate = batches * batch_size * P / (time.time() - t)
    log(f"loader WARM steady-state: {rate:.1f} pairs/s "
        f"({batches} batches of {batch_size} windows, {workers} workers)")
    return {"loader_pairs_per_sec_cold": round(cold_rate, 1),
            "loader_pairs_per_sec_warm": round(rate, 1)}


def bench_e2e(cfg, dataset, batches: int, workers: int, spc: int,
              batch_size: int):
    """Host-fed full train step on the real device."""
    import jax

    from benchmarks.common import setup_state
    from deeplio_tpu.data.pipeline import DevicePrefetcher
    from deeplio_tpu.parallel import make_mesh
    from deeplio_tpu.train import build_train_step

    mesh = make_mesh(data=-1)
    n_chips = len(jax.devices())
    log(f"devices: {n_chips} x {jax.devices()[0].device_kind}")
    model, state, tx = setup_state(cfg, mesh)
    log("train state ready on device")
    train_step, _ = build_train_step(cfg, model, tx, mesh,
                                     steps_per_call=spc)

    stream = _epoch_stream(dataset, batch_size, workers)
    prefetch = DevicePrefetcher(stream, mesh, depth=3)

    def call(state):
        if spc == 1:
            return train_step(state, next(prefetch))
        bs = [next(prefetch) for _ in range(spc)]
        state, ms = train_step(state, *bs)
        return state, ms[-1]

    # warmup: compile + fill scan caches (>= one full epoch of batches)
    n_warm = max(3, -(-dataset.steps_per_epoch(batch_size) // spc))
    for i in range(n_warm):
        state, m = call(state)
        if i == 0:
            loss = float(jax.device_get(m["loss"]))
            log(f"first step done (compile), loss={loss:.4f}")
    jax.device_get(m["loss"])
    log(f"warmup done ({n_warm} calls)")

    P = cfg.datasets.num_pairs
    t = time.time()
    for _ in range(batches):
        state, m = call(state)
    final = float(jax.device_get(m["loss"]))  # sync the full chain
    dt = time.time() - t
    assert np.isfinite(final)
    rate = batches * spc * batch_size * P / dt / n_chips
    log(f"END-TO-END host-fed: {rate:.1f} pairs/s/chip "
        f"({batches} calls x {spc} steps, batch {batch_size})")
    return {"e2e_pairs_per_sec_per_chip": round(rate, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="slot-bin,loader,relay,e2e")
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--spc", type=int, default=2)
    ap.add_argument("--drives", type=int, default=8)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()
    stages = args.stages.split(",")

    cfg = flagship_cfg(args.drives, args.frames)
    out = {}
    if "relay" in stages:
        out.update(bench_relay())
    if "slot-bin" in stages:
        out.update(bench_slot_bin(cfg, workers=args.workers))
    if "loader" in stages or "e2e" in stages:
        from deeplio_tpu.data.dataset import build_dataset

        dataset = build_dataset(cfg, "train")
        log(f"dataset: {len(dataset)} windows over {args.drives} drives "
            f"x {args.frames} frames")
        if len(dataset) < args.batch_size:
            raise SystemExit("dataset smaller than one batch — raise "
                             "--drives/--frames")
    if "loader" in stages:
        out.update(bench_loader(cfg, dataset, args.batches, args.workers,
                                args.batch_size))
    if "e2e" in stages:
        out.update(bench_e2e(cfg, dataset, args.batches, args.workers,
                             args.spc, args.batch_size))
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
