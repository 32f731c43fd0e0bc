"""Op-level xplane profile of the flagship train step (bench.py protocol).

Prints the device-time budget bucketed by pipeline component plus the
top-N individual ops — the measurement source for docs/performance.md's
step-budget table. Optional overrides like bench_stem_ab:

    python benchmarks/profile_step.py [k=v ...]   # flagship overrides
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import yaml

from __graft_entry__ import _FLAGSHIP, _raw_batch
from common import setup_state, stage_batches
from deeplio_tpu.config import load_config_dict
from deeplio_tpu.parallel import make_mesh
from deeplio_tpu.train import build_train_step
from xplane import bucket_ops, parse_trace

BATCH = 16
ITERS = 8


def main():
    d = yaml.safe_load(_FLAGSHIP)
    seen = set()
    for tok in sys.argv[1:]:
        k, v = tok.split("=", 1)
        d["lidar-feat-pointseg"][k] = v
        seen.add(k)
    # pool=stride-fold (the flagship pin) requires stem=classic; a stem
    # override would crash config validation unless it pins its own pool.
    blk = d["lidar-feat-pointseg"]
    if (blk.get("stem", "classic") != "classic" and "pool" not in seen
            and blk.get("pool") == "stride-fold"):
        blk["pool"] = "stride"
    cfg = load_config_dict(d)
    mesh = make_mesh(data=-1)
    model, state, tx = setup_state(cfg, mesh)
    train_step, _ = build_train_step(cfg, model, tx, mesh)
    raw = _raw_batch(cfg, BATCH * len(jax.devices()), seed=0)
    batches = stage_batches(mesh, raw, 3)

    for i in range(3):
        state, m = train_step(state, batches[i % 3])
    print(f"warm, loss={float(jax.device_get(m['loss'])):.4f}", flush=True)

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(ITERS):
                state, m = train_step(state, batches[i % 3])
            float(jax.device_get(m["loss"]))
        wall = (time.time() - t0) / ITERS
        ops, modules = parse_trace(td)
    dev = sum(modules.values()) / ITERS / 1e3
    print(f"\nhost wall {wall * 1e3:.1f} ms/step, device wall {dev:.1f} ms")
    print("buckets (ms/step):")
    for k, us in sorted(bucket_ops(ops).items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {us / ITERS / 1e3:7.2f}")
    print("top ops (ms/step):")
    for name, us in sorted(ops.items(), key=lambda kv: -kv[1])[:28]:
        print(f"  {us / ITERS / 1e3:7.3f}  {name[:90]}")
    # The pallas/custom-call bucket held ~9 ms of sub-cutoff ops at r3
    # HEAD (19.9 total vs 10.7 for the ring kernel op) — enumerate that
    # bucket exhaustively so its composition is never hidden again.
    cc = {n: us for n, us in ops.items()
          if "custom-call" in n.lower() or "tpu_custom_call" in n.lower()}
    print(f"custom-call bucket: {len(cc)} ops, "
          f"{sum(cc.values()) / ITERS / 1e3:.2f} ms/step")
    for name, us in sorted(cc.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {us / ITERS / 1e3:7.3f}  {name[:160]}")


if __name__ == "__main__":
    main()
