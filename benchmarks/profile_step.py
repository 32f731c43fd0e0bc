"""Op-level xplane profile of the flagship train step (bench.py protocol).

Prints the device-time budget bucketed by pipeline component plus the
top-N individual ops — the measurement source for docs/performance.md's
step-budget table. Optional overrides like bench_stem_ab:

    python benchmarks/profile_step.py [k=v ...]   # flagship overrides
"""

from __future__ import annotations

import os
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
from xplane import _TARGET_RE, bucket_ops, opcode_of, parse_trace

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

    td = os.environ.get("DEEPLIO_PROFILE_DIR") or tempfile.mkdtemp(
        prefix="deeplio_prof_")
    t0 = time.time()
    with jax.profiler.trace(td):
        for i in range(ITERS):
            state, m = train_step(state, batches[i % 3])
        float(jax.device_get(m["loss"]))
    wall = (time.time() - t0) / ITERS
    ops, modules = parse_trace(td)
    print(f"trace kept at {td} (re-bucket offline with xplane.parse_trace)")
    report(ops, modules, wall)


def report(ops, modules, wall=None):
    dev = sum(modules.values()) / ITERS / 1e3
    if wall is not None:
        print(f"\nhost wall {wall * 1e3:.1f} ms/step, device wall {dev:.1f} ms")
    else:
        print(f"\ndevice wall {dev:.1f} ms")
    buckets = bucket_ops(ops)
    print("buckets (ms/step):")
    for k, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {us / ITERS / 1e3:7.2f}")
    # Per-bucket top ops: the round-3 "9 ms custom-call residual" was an
    # attribution artifact (fusions CONSUMING %custom-call operands were
    # substring-matched into the kernel bucket); classification is now by
    # parsed opcode, and every bucket is enumerable so composition is
    # never hidden again.
    per = {k: [] for k in buckets}
    for name, us in ops.items():
        op = opcode_of(name)
        own = name.split(" = ", 1)[0].lower()
        if op == "custom-call":
            tgt = _TARGET_RE.search(name)
            key = (f"custom-call:{tgt.group(1)}"
                   if tgt and "tpu_custom_call" not in tgt.group(1)
                   else "pallas-kernel")
        elif op == "convolution" or "convolution" in own:
            key = "conv"
        elif op == "sort":
            key = "sort"
        elif op == "while":
            key = "scan/rnn"
        elif op in ("fusion", "copy", "transpose", "bitcast", "reshape"):
            key = "fusion/layout"
        else:
            key = "other"
        per[key].append((us, name))
    for k in sorted(per, key=lambda k: -buckets[k]):
        print(f"\n[{k}] top ops (ms/step):")
        for us, name in sorted(per[k], reverse=True)[:12]:
            print(f"  {us / ITERS / 1e3:7.3f}  {name[:120]}")


if __name__ == "__main__":
    main()
