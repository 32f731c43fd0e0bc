"""Driver-contract smoke: bench.py and dryrun_multichip must run to
completion and emit their artifacts WITHOUT a TPU.

The round-2 bench went red (rc=124, no JSON) because the entry point was
never exercised under driver-like conditions after an HLO-touching
change (VERDICT.md). This runs the EXACT contract files as subprocesses:
bench.py in its CPU test mode (reduced iters via env), asserting rc==0
and a parseable final JSON line on stdout.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = str(pathlib.Path(__file__).resolve().parents[2])


def test_bench_py_contract_cpu():
    env = dict(os.environ)
    env.update({
        "DEEPLIO_BENCH_CPU": "1",
        "DEEPLIO_BENCH_BATCH": "2",
        "DEEPLIO_BENCH_WARMUP": "1",
        "DEEPLIO_BENCH_ITERS": "6",
        "DEEPLIO_JAX_CACHE": "",
        "XLA_FLAGS": env_xla(os.environ.get("XLA_FLAGS", "")),
    })
    proc = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON on stdout:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    last = json.loads(lines[-1])
    assert last["metric"] == "frame_pairs_per_sec_per_chip"
    assert last["value"] > 0
    assert last["unit"] == "pairs/s/chip"
    assert "vs_baseline" in last
    # The provisional line must have come first (timeout survivability).
    assert any(json.loads(l).get("provisional") for l in lines[:-1])


def env_xla(cur: str) -> str:
    return (cur + " --xla_force_host_platform_device_count=1").strip()


def test_bench_py_degraded_relay_reemits_provisional():
    """DEEPLIO_BENCH_BUDGET_S=0 forces the degraded-relay path (no budget
    left for an unchunked final window): the final window runs in chunks
    and RE-EMITS an updated provisional after each, so a kill at any
    point past the first chunk still leaves a steady-state number as the
    last JSON line (VERDICT r4 weak-5)."""
    env = dict(os.environ)
    env.update({
        "DEEPLIO_BENCH_CPU": "1",
        "DEEPLIO_BENCH_BATCH": "2",
        "DEEPLIO_BENCH_WARMUP": "1",
        "DEEPLIO_BENCH_ITERS": "10",   # final window 6 -> chunks 4 + 2
        "DEEPLIO_BENCH_BUDGET_S": "0",
        "XLA_FLAGS": env_xla(os.environ.get("XLA_FLAGS", "")),
    })
    proc = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.strip().startswith("{")]
    # initial provisional + first-chunk re-emit + final
    assert len(lines) == 3, proc.stdout
    assert all(l.get("provisional") for l in lines[:-1])
    assert not lines[-1].get("provisional")
    assert lines[-1]["value"] > 0


def test_dryrun_multichip_contract():
    """The driver's exact invocation; must succeed with no TPU (the
    subprocess liveness probe + virtual-CPU-mesh respawn path) and keep
    its output free of cpu_aot_loader machine-feature mismatches (the
    SIGILL hazard from cross-host CPU AOT cache hits)."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=dict(os.environ), capture_output=True, text=True,
        timeout=1500)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "train+eval step OK" in proc.stdout
    assert "cpu_aot_loader" not in proc.stderr
