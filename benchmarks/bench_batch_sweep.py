"""Sweep the per-step window batch through the FULL bench.py protocol.

Motivation (round 3): the xplane step budget shows the attributed op time
and module wall agree, but ~9 ms/step of the custom-call bucket sits in
sub-cutoff events — if any of it is per-program fixed overhead (op
dispatch gaps, kernel grid ramp), a larger per-step batch amortizes it
directly with zero model change. B=16 windows (128 pairs) is the bench
protocol point; this sweeps B and reports pairs/s/chip at each.

    python benchmarks/bench_batch_sweep.py 16 24 32
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import yaml

from __graft_entry__ import _FLAGSHIP, _raw_batch
from common import setup_state, stage_batches
from deeplio_tpu.config import load_config_dict
from deeplio_tpu.parallel import make_mesh
from deeplio_tpu.train import build_train_step


def run_batch(batch: int, iters: int, spc: int = 1) -> float:
    cfg = load_config_dict(yaml.safe_load(_FLAGSHIP))
    mesh = make_mesh(data=-1)
    n_chips = len(jax.devices())
    model, state, tx = setup_state(cfg, mesh)
    train_step, _ = build_train_step(cfg, model, tx, mesh,
                                     steps_per_call=spc)
    raw = _raw_batch(cfg, batch * n_chips, seed=0)
    batches = stage_batches(mesh, raw, 3)

    def call(state, i):
        if spc == 1:
            return train_step(state, batches[i % 3])
        return train_step(state, *[batches[(i * spc + j) % 3]
                                   for j in range(spc)])

    for i in range(3):
        state, m = call(state, i)
    last = m[-1] if spc > 1 else m
    assert np.isfinite(float(jax.device_get(last["loss"])))

    t0 = time.time()
    for i in range(iters):
        state, m = call(state, i)
    last = m[-1] if spc > 1 else m
    loss = float(jax.device_get(last["loss"]))
    dt = (time.time() - t0) / iters / spc
    assert np.isfinite(loss)
    pairs = batch * n_chips * cfg.datasets.num_pairs
    rate = pairs / dt / n_chips
    print(f"B={batch:3d} spc={spc} ({pairs // n_chips:4d} pairs/chip/step): "
          f"{dt * 1e3:7.1f} ms/step  {rate:7.1f} pairs/s/chip", flush=True)
    return rate


def main():
    # args: B or B:spc tokens, e.g. "16 24 32 16:4"
    specs = []
    for a in sys.argv[1:]:
        b, _, s = a.partition(":")
        specs.append((int(b), int(s or 1)))
    specs = specs or [(16, 1), (24, 1), (32, 1)]
    for b, s in specs:
        run_batch(b, iters=12, spc=s)


if __name__ == "__main__":
    main()
