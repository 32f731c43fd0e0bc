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
import re
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


_OPCODE_RE = re.compile(r"(?<![%\w.\-])([a-z][a-z0-9\-]*)\(")
_TARGET_RE = re.compile(r'custom_call_target="([^"]*)"')


def opcode_of(name: str) -> str:
    """Parse the HLO opcode out of a full xplane event text.

    Event names are full HLO lines, `%op.N = SHAPE opcode(operands), ...`.
    The opcode is the first bare lowercase word directly followed by `(`
    after the `=` — operand names are prefixed with `%`, and shape/layout
    annotations like `T(8,128)` / `S(1)` start uppercase, so neither can
    match. Substring matching on the whole line is WRONG: any fusion that
    merely consumes a `%custom-call.N` operand would classify as a
    custom-call (the round-3 "9 ms residual" was exactly this artifact).
    """
    _, eq, rhs = name.partition(" = ")
    m = _OPCODE_RE.search(rhs if eq else name)
    return m.group(1) if m else "unknown"


def bucket_ops(ops: Dict[str, float]) -> Dict[str, float]:
    """Group op-level durations into coarse pipeline components.

    Classification is by parsed opcode + the op's own name (the text
    before ` = `), never by operand text.
    """
    buckets: Dict[str, float] = defaultdict(float)
    for name, us in ops.items():
        op = opcode_of(name)
        own = name.split(" = ", 1)[0].lower()
        if op == "custom-call":
            tgt = _TARGET_RE.search(name)
            if tgt and "tpu_custom_call" not in tgt.group(1):
                buckets[f"custom-call:{tgt.group(1)}"] += us
            else:
                buckets["pallas-kernel"] += us
        elif op == "convolution" or "convolution" in own:
            buckets["conv"] += us
        elif op == "sort":
            buckets["sort"] += us
        elif op == "while":
            buckets["scan/rnn"] += us
        elif op in ("fusion", "copy", "transpose", "bitcast", "reshape"):
            buckets["fusion/layout"] += us
        else:
            buckets["other"] += us
    return dict(buckets)
