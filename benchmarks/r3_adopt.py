"""Summarize the r3 measurement blitz and print adoption decisions.

Reads the JSON lines that benchmarks/r3_measure.sh's bench stages leave in
/tmp/r3_measure/*.out and prints a ranked table plus the exact flagship
edits each winner implies. Decision rule (docs/performance.md): a knob is
adopted only if its driver-protocol bench beats the pinned baseline by
>1% (beyond run-to-run variance observed at ~0.5-1%), and the final
configuration must be re-validated with a plain `timeout 590 python
bench.py` (rc==0 + JSON) before the flagship pin moves.

Usage: python benchmarks/r3_adopt.py [/tmp/r3_measure]
"""

from __future__ import annotations

import json
import os
import sys

STAGES = [
    # (file, knobs implied by the stage, description)
    ("bench.out", {}, "pinned baseline (kernel-packed off, spb 1, spc 1)"),
    ("bench_packed.out", {"kernel-packed": "on"}, "packed routing word"),
    ("bench_spb2.out", {"kernel-packed": "on", "kernel-spb": 2},
     "packed + 2 scans/grid-step"),
    ("bench_spb4.out", {"kernel-packed": "on", "kernel-spb": 4},
     "packed + 4 scans/grid-step"),
    ("bench_combo.out", {"kernel-packed": "on", "kernel-spb": 2,
                         "steps-per-call": 2},
     "packed + spb2 + 2 steps/call"),
]


def last_json(path: str):
    if not os.path.exists(path):
        return None
    out = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return out


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_measure"
    rows = []
    for fname, knobs, desc in STAGES:
        j = last_json(os.path.join(out_dir, fname))
        rows.append((j.get("value") if j else None, knobs, desc, fname, j))

    base = rows[0][0]
    if base is None:
        print(f"no baseline JSON in {out_dir}/bench.out — blitz stage 1 "
              "did not complete; nothing to adopt")
        return 1

    print(f"{'pairs/s/chip':>13}  {'vs pinned':>9}  stage")
    for value, knobs, desc, fname, j in rows:
        if value is None:
            print(f"{'—':>13}  {'—':>9}  {desc} ({fname} missing/failed)")
            continue
        rel = value / base - 1.0
        mark = " <-- ADOPT" if rel > 0.01 else ""
        print(f"{value:>13.1f}  {rel:>+8.1%}  {desc}{mark}")

    best = max((r for r in rows if r[0] is not None), key=lambda r: r[0])
    if best[0] > base * 1.01:
        print("\nwinner:", best[2])
        print("apply in __graft_entry__._FLAGSHIP / bench.py flagship ds:")
        for k, v in best[1].items():
            if k == "steps-per-call":
                print(f"  train: steps-per-call: {v}")
            else:
                print(f"  datasets: {k}: {v!r}")
        print("then re-validate: timeout 590 python bench.py  (rc==0 + JSON)"
              "\nand add a ledger row in docs/performance.md + README.")
    else:
        print("\nno stage beats the pinned baseline by >1% — keep "
              "kernel-packed off / spb 1 / spc 1 and record the negative "
              "results in the ledger.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
