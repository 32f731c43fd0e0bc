"""Benchmark: KITTI frame-pairs/sec/chip through projection+forward+backward.

Protocol (SURVEY.md §6): pairs consumed by the optimizer step / wall time /
chips, steady-state, on the flagship DeepLIO config (PointSeg encoder,
64x1024x5 range images from 131072-point scans, IMU LSTM, soft fusion, LWS
loss). The FULL train step runs: device-side spherical projection of every
window frame, forward, loss, backward, psum, optimizer update. Input
batches are pre-staged device-resident (3 distinct buffers cycled —
utils/timing.py measurement rule 3) so the number measures the compiled
pipeline, not host synthesis of fake data. The HOST side of the pipeline
is measured separately and honestly by benchmarks/bench_pipeline.py —
on THIS environment (1 CPU core, ~10 MB/s axon relay) the host cannot
feed the device at this rate; docs/performance.md "input pipeline"
section quantifies both ceilings and the multi-core design headroom.

Timeout survivability (the round-2 bench produced rc=124 with ZERO output
— VERDICT.md): this run streams stage-by-stage progress to stderr and
prints a *provisional* JSON result line as soon as one steady-state window
(PROVISIONAL_ITERS post-warmup steps) is measured, then refines over the
full ITERS window and prints the final line. The driver parses the LAST
JSON line on stdout, so a timeout after the provisional line still yields
a real number. Startup costs that round 2 paid on-device are moved to the
host: params are initialised on the CPU backend with a reduced-width probe
(bit-identical — models/zoo.py::init_model_fast) and device_put once.

Prints JSON lines of the form:
    {"metric": "frame_pairs_per_sec_per_chip", "value": N,
     "unit": "pairs/s/chip", "vs_baseline": N / 5000.0}
(5000 pairs/s/chip is the BASELINE.json north-star target; the upstream
reference publishes no numbers — BASELINE.md.)
"""

from __future__ import annotations

import json
import signal
import sys
import time

_T0 = time.time()
_EMITTED = False


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(value: float, provisional: bool) -> None:
    global _EMITTED
    line = {
        "metric": "frame_pairs_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / TARGET, 4),
    }
    if provisional:
        line["provisional"] = True
    print(json.dumps(line), flush=True)
    _EMITTED = True


def _on_signal(signum, frame):
    _log(f"received signal {signum}; "
         + ("a provisional result is already on stdout" if _EMITTED
            else "NO result was measured yet"))
    sys.exit(0 if _EMITTED else 1)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGINT, _on_signal)

_log("importing jax + deeplio_tpu ...")

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("DEEPLIO_BENCH_CPU"):
    # Test-suite mode: run the whole contract file on the CPU backend
    # (the shell-level JAX_PLATFORMS is overridden by the host
    # sitecustomize; only the in-process update wins). The projector
    # transparently uses the XLA ring twin on CPU.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import yaml  # noqa: E402

from __graft_entry__ import _FLAGSHIP, _raw_batch  # noqa: E402
from deeplio_tpu.config import load_config_dict  # noqa: E402
from deeplio_tpu.losses import init_loss_params  # noqa: E402
from deeplio_tpu.models import init_model_fast  # noqa: E402
from deeplio_tpu.parallel import make_mesh, replicate, shard_batch  # noqa: E402
from deeplio_tpu.train import (build_train_step, create_train_state,  # noqa: E402
                               make_optimizer)

_log("imports done")

# Protocol constants. The env overrides exist ONLY so the test suite can
# run this exact file to completion on the CPU backend (contract smoke —
# the round-2 bench went red from an untested entry point, VERDICT.md);
# driver runs use the defaults.
BATCH = int(os.environ.get("DEEPLIO_BENCH_BATCH", 16))
WARMUP = int(os.environ.get("DEEPLIO_BENCH_WARMUP", 3))
PROVISIONAL_ITERS = 4
# Final window needs >= 1 iter past the provisional one (DEEPLIO_BENCH_ITERS
# is a test/CI override; values <= PROVISIONAL_ITERS would make the final
# window empty and crash after the provisional emit).
ITERS = max(int(os.environ.get("DEEPLIO_BENCH_ITERS", 20)),
            PROVISIONAL_ITERS + 1)
# Distinct staged input buffers (>=3: measurement rule 3; default 6 so
# the spc=6 default cycles 6 distinct buffers with NO repeats per call).
# Extra buffers are device-side rolls, so raising this costs no extra
# relay transfer (~1 s each to stage).
N_BATCHES = max(int(os.environ.get("DEEPLIO_BENCH_NB", 6)), 3)
TARGET = 5000.0
# Wall-clock budget for the whole process: the driver runs
# `timeout 590 python bench.py`, minus a small margin for the final emit.
# The degraded-relay decision (see main) compares the REMAINING budget
# against the measured cost of the final window (known from the
# provisional window), not elapsed time alone: a slow relay prologue
# (172 s transfer probe + 98 s 1-core param init, observed 2026-08-20)
# can burn 400+ s and still leave 3 minutes of budget for a ~1.5 s
# unchunked window — and the chunked mode's per-chunk relay syncs land
# inside the timed region, costing real measured rate on exactly the
# slow-relay days that trigger it (measured: 4,613.2 chunked vs 4,980.8
# unchunked at the identical committed flagship, 2026-08-20 vs -19).
BUDGET_S = float(os.environ.get("DEEPLIO_BENCH_BUDGET_S", 585.0))


def _sync_scalar(x) -> float:
    # NOTE: on the axon backend jax.block_until_ready can return before the
    # computation finishes; jax.device_get of a value is the reliable sync.
    return float(jax.device_get(x))


def _wait_for_backend(probe_timeout: float = 110.0) -> None:
    """Probe backend liveness in a subprocess before touching it here.

    A dead/wedged axon relay makes the first jax.devices() call block
    indefinitely with no output (and it holds the GIL, so no in-process
    watchdog can fire). The subprocess probe turns that failure mode into
    loud, bounded retries. Probing continues until a wall-clock deadline
    (DEEPLIO_BENCH_PROBE_DEADLINE_S from process start, default 420 s —
    catches a relay that recovers mid-window); past the deadline the run
    FAILS FAST AND LOUD: a structured error JSON on stdout + exit 3,
    instead of the round-3 failure mode of blocking inside PJRT init
    until the driver's SIGTERM (+1840 s, zero output — VERDICT.md).
    Exiting early leaves the driver's timeout budget available for a
    retry that might catch the relay back up.
    """
    from __graft_entry__ import probe_device_count

    if os.environ.get("DEEPLIO_BENCH_CPU"):
        return
    deadline = _T0 + float(
        os.environ.get("DEEPLIO_BENCH_PROBE_DEADLINE_S", "420"))
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        budget = min(probe_timeout, max(deadline - time.time(), 10.0))
        _log(f"probing TPU backend liveness (subprocess, attempt {attempt}, "
             f"timeout {budget:.0f}s, deadline +{deadline - _T0:.0f}s) ...")
        t0 = time.time()
        n = probe_device_count(timeout_s=budget)
        if n:
            _log(f"backend alive: {n} device(s)")
            return
        _log("backend probe FAILED (relay down or wedged)")
        if time.time() - t0 < 10.0:
            # Fast-erroring relay (e.g. connection refused): don't hot-spin.
            time.sleep(min(15.0, max(deadline - time.time(), 0.0)))
    _log(f"backend never answered within the probe deadline "
         f"({attempt} attempts); failing fast")
    print(json.dumps({
        "error": "backend unavailable",
        "detail": f"TPU relay did not answer {attempt} subprocess probes "
                  f"within {deadline - _T0:.0f}s",
    }), flush=True)
    sys.exit(3)


def main():
    d = yaml.safe_load(_FLAGSHIP)
    # Kernel-knob A/Bs under the EXACT driver protocol (r3_measure.sh):
    # space-separated key=value pairs merged into the datasets section,
    # e.g. DEEPLIO_BENCH_DS="kernel-packed=on kernel-spb=2". Driver runs
    # leave it unset.
    for tok in os.environ.get("DEEPLIO_BENCH_DS", "").split():
        k, v = tok.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            pass
        d["datasets"][k] = v
        _log(f"datasets override: {k} = {v!r}")
    # Same mechanism for the optimizer section, e.g.
    # DEEPLIO_BENCH_OPT="flat-update=true". Driver runs leave it unset.
    for tok in os.environ.get("DEEPLIO_BENCH_OPT", "").split():
        k, v = tok.split("=", 1)
        if v.lower() in ("true", "false"):
            v = v.lower() == "true"
        else:
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    pass
        d.setdefault("optimizer", {})[k] = v
        _log(f"optimizer override: {k} = {v!r}")
    # Same mechanism for the lidar tower section, e.g.
    # DEEPLIO_BENCH_LIDAR="stem=pair-split". Driver runs leave it unset.
    for tok in os.environ.get("DEEPLIO_BENCH_LIDAR", "").split():
        k, v = tok.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            pass
        d.setdefault("lidar-feat-pointseg", {})[k] = v
        _log(f"lidar-feat-pointseg override: {k} = {v!r}")
    cfg = load_config_dict(d)
    _wait_for_backend()
    n_chips = len(jax.devices())
    mesh = make_mesh(data=-1)
    _log(f"devices: {n_chips} x {jax.devices()[0].device_kind}")

    tx = make_optimizer(cfg.optim, 1000)
    # ALL host-side setup runs on the CPU backend: a single stray eager op
    # on the axon device costs a ~30 s relay round-trip — or minutes when
    # the relay is degraded (observed: PRNGKey creation blocking 660 s on
    # a wedged relay). The only device interactions below are device_put
    # transfers and the one jitted train_step.
    #
    # Probe init (bit-identical params, verified against full-size
    # eval_shape) replaces the ~124 s on-device init program of round 2.
    # The persistent cache is disabled around the CPU work: CPU AOT
    # artifacts are host-feature-specific, and both writing them to and
    # loading them from the repo-persisted cache risks cross-machine
    # SIGILL (observed cpu_aot_loader feature-mismatch errors otherwise).
    old_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        model, variables = init_model_fast(cfg, jax.random.PRNGKey(0),
                                           axis_name="data", probe_width=64)
        _log("model params initialised on host CPU")
        state = create_train_state(variables, init_loss_params(cfg.loss), tx,
                                   jax.random.PRNGKey(1),
                                   flat=cfg.optim.flat_update)
    jax.config.update("jax_compilation_cache_dir", old_dir)

    _log("probing device transfer (hangs here = wedged TPU relay) ...")
    t = time.time()
    jax.device_get(jax.device_put(np.ones(8, np.float32), jax.devices()[0]))
    _log(f"relay round-trip ok in {time.time() - t:.1f}s")

    state = replicate(mesh, state)
    jax.block_until_ready(state.params)
    _log("train state transferred to device")

    # steps-per-call: k optimizer steps per compiled program, each timed
    # call consuming k distinct batches (last-ulp-exact vs sequential
    # steps — tests/distributed/test_shard_map.py). Default 6, ADOPTED
    # from the round-5 on-chip A/B ladder at the halves/pair-split
    # flagship (benchmarks/r5b_measure.sh, r5d_measure.sh): spc2 4945.8 /
    # spc3 4969.5 / spc6+NB6 5023.7 pairs/s/chip (same-session spc3
    # anchor 4975.2) — per-call relay dispatch costs ~1 ms on a healthy
    # relay and ~6 ms on a degraded one, so deeper amortization matters
    # most on exactly the days the grading run risks. All six buffers per
    # call are distinct (N_BATCHES=6, no repeats). Earlier round-4
    # ladder: spc1 3421.2 / spc2 3484.4. Env override for A/Bs only.
    spc = max(int(os.environ.get("DEEPLIO_BENCH_SPC", "6")), 1)
    if spc > 1:
        _log(f"steps-per-call: {spc}")
    train_step, _ = build_train_step(cfg, model, tx, mesh,
                                     steps_per_call=spc)

    batch_size = BATCH * n_chips
    # One host synthesis + ONE transfer; the other distinct buffers are
    # derived on device with jitted batch-axis rolls (identical content to
    # the old host-side np.roll staging, ~1/N_BATCHES the relay transfer
    # time — the staging phase was the bench's biggest timeout hazard on a
    # degraded relay).
    import jax.numpy as jnp
    raw = _raw_batch(cfg, batch_size, seed=0)
    batches = [shard_batch(mesh, raw)]
    jax.block_until_ready(batches[0]["points_x"])
    _log(f"staged device batch 1/{N_BATCHES} (host transfer)")
    roll = jax.jit(
        lambda b, s: {k: jnp.roll(v, s, axis=0) for k, v in b.items()},
        static_argnums=1)
    for s in range(1, N_BATCHES):
        batches.append(roll(batches[0], s))
        jax.block_until_ready(batches[-1]["points_x"])
        _log(f"staged device batch {s + 1}/{N_BATCHES} (device-side roll)")

    def call(state, idx):
        """One timed invocation = spc optimizer steps on distinct batches."""
        if spc == 1:
            return train_step(state, batches[idx % N_BATCHES])
        sel = [batches[(idx * spc + j) % N_BATCHES] for j in range(spc)]
        state, ms = train_step(state, *sel)
        return state, ms[-1]

    for i in range(WARMUP):
        _log(f"warmup step {i + 1}/{WARMUP} dispatched"
             + (" (first call: compile-or-load of the step executable; "
                "minutes-scale through the axon relay)" if i == 0 else ""))
        state, m = call(state, i)
        loss = _sync_scalar(m["loss"])
        _log(f"warmup step {i + 1} done, loss={loss:.4f}")
    assert np.isfinite(loss)

    pairs = batch_size * cfg.datasets.num_pairs * spc
    done = WARMUP

    def window(n_iters: int) -> float:
        """Elapsed seconds for n_iters timed calls (one sync at the end)."""
        nonlocal state, done
        t0 = time.time()
        for i in range(n_iters):
            state, m = call(state, done + i)
        final_loss = _sync_scalar(m["loss"])  # forces the full chain
        dt = time.time() - t0
        done += n_iters
        assert np.isfinite(final_loss)
        return dt

    dt1 = window(PROVISIONAL_ITERS)
    v1 = pairs * PROVISIONAL_ITERS / dt1 / n_chips
    _log(f"provisional window ({PROVISIONAL_ITERS} iters): {v1:.1f} pairs/s/chip")
    _emit(v1, provisional=True)

    # Final window. Enough budget left for the full window: ONE window
    # with a single terminal sync — the exact protocol every ledger number
    # used. Budget nearly exhausted (the relay prologue ate it): chunks of
    # PROVISIONAL_ITERS, re-emitting the cumulative steady-state rate
    # after each chunk so a kill at ANY point still leaves the tightest
    # number measured so far on stdout (the driver parses the LAST JSON
    # line). The per-chunk syncs land inside the timed region, so chunked
    # numbers read a touch low — acceptable only when the alternative is
    # risking rc=124 with only the 4-iter provisional emitted, hence the
    # gate: remaining budget vs 4x the window cost the provisional window
    # just measured (+45 s for a straggling terminal sync).
    remaining = ITERS - PROVISIONAL_ITERS
    budget_left = BUDGET_S - (time.time() - _T0)
    est_full = dt1 * remaining / PROVISIONAL_ITERS
    degraded = budget_left < 4.0 * est_full + 45.0
    if degraded:
        _log(f"degraded relay (budget left {budget_left:.0f}s < "
             f"4x{est_full:.1f}s window + 45s): chunked final window "
             f"with re-emits")
    t_sum, n_sum = 0.0, 0
    while n_sum < remaining:
        k = min(PROVISIONAL_ITERS, remaining - n_sum) if degraded \
            else remaining - n_sum
        t_sum += window(k)
        n_sum += k
        v2 = pairs * n_sum / t_sum / n_chips
        last = n_sum == remaining
        _log(f"final window {n_sum}/{remaining} iters: {v2:.1f} pairs/s/chip")
        _emit(v2, provisional=not last)
    assert int(_sync_scalar(state.step)) == (WARMUP + ITERS) * spc


if __name__ == "__main__":
    main()
