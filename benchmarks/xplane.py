"""Minimal xplane.pb parser for op-level TPU budgets (verify-skill recipe).

Usage:
    with jax.profiler.trace(dir): ... run jitted calls ...
    ops, modules = parse_trace(dir)      # {event_name: total_us}, wall us

The "XLA Ops" line gives per-op device time; the "XLA Modules" line gives
true device wall time per compiled module (host-measured walls include
~1-3 ms/call of axon relay dispatch).
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Tuple

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def parse_trace(trace_dir: str, device_substr: str = "TPU") -> Tuple[
        Dict[str, float], Dict[str, float]]:
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    ops: Dict[str, float] = defaultdict(float)
    modules: Dict[str, float] = defaultdict(float)
    for path in sorted(paths, key=os.path.getmtime)[-1:]:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if device_substr not in plane.name or "SparseCore" in plane.name:
                continue
            for line in plane.lines:
                target = (ops if line.name == "XLA Ops"
                          else modules if line.name == "XLA Modules" else None)
                if target is None:
                    continue
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    target[name] += ev.duration_ps / 1e6
    return dict(ops), dict(modules)


def bucket_ops(ops: Dict[str, float]) -> Dict[str, float]:
    """Group op-level durations into coarse pipeline components."""
    buckets: Dict[str, float] = defaultdict(float)
    for name, us in ops.items():
        n = name.lower()
        if "custom-call" in n or "tpu_custom_call" in n:
            buckets["pallas-kernel"] += us
        elif "conv" in n:
            buckets["conv"] += us
        elif "sort" in n:
            buckets["sort"] += us
        elif "while" in n:
            buckets["scan/rnn"] += us
        elif "fusion" in n or "copy" in n or "transpose" in n:
            buckets["fusion/layout"] += us
        else:
            buckets["other"] += us
    return dict(buckets)
