"""Dead-relay fail-fast contract: bench.py must NOT burn the driver's
whole timeout when the TPU backend is down.

Round-3 failure mode (VERDICT.md): after 3 failed liveness probes the
bench "attempted real init anyway" and then blocked inside PJRT client
creation until the driver's SIGTERM at +1840 s with zero stdout. The
contract now: probe in bounded subprocesses until the wall-clock
deadline (DEEPLIO_BENCH_PROBE_DEADLINE_S), then print a structured
``{"error": "backend unavailable"}`` JSON line and exit 3 — within
seconds of the deadline, never touching in-process backend init.

The dead relay is simulated with DEEPLIO_PROBE_CMD (the probe child
exits non-zero immediately), so this runs anywhere, fast, with no TPU.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

REPO = str(pathlib.Path(__file__).resolve().parents[2])


def test_bench_fails_fast_on_dead_backend():
    env = dict(os.environ)
    env.update({
        # Simulated dead relay: every subprocess probe fails instantly.
        "DEEPLIO_PROBE_CMD": "raise SystemExit(1)",
        "DEEPLIO_BENCH_PROBE_DEADLINE_S": "25",
        "DEEPLIO_JAX_CACHE": "",
    })
    env.pop("DEEPLIO_BENCH_CPU", None)  # CPU mode would skip the probes
    t0 = time.time()
    proc = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=150)
    elapsed = time.time() - t0
    assert proc.returncode == 3, (proc.returncode, proc.stderr[-3000:])
    # Exit must come within seconds of the probe deadline (25 s) plus
    # interpreter/import startup — far under the driver's 600 s budget.
    assert elapsed < 90, f"took {elapsed:.0f}s; fail-fast contract broken"
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON on stdout:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    last = json.loads(lines[-1])
    assert last["error"] == "backend unavailable"
    # At least one probe attempt must have been made and logged.
    assert "probe FAILED" in proc.stderr
