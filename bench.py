"""Benchmark: KITTI frame-pairs/sec/chip through projection+forward+backward.

Protocol (SURVEY.md §6): pairs consumed by the optimizer step / wall time /
chips, steady-state, on the flagship DeepLIO config (PointSeg encoder,
64x1024x5 range images from 131072-point scans, IMU LSTM, soft fusion, LWS
loss). The FULL train step runs: device-side spherical projection of every
window frame, forward, loss, backward, psum, optimizer update. Input
batches are pre-staged device-resident (4 distinct batches cycled) so the
number measures the compiled pipeline, not host synthesis of fake data;
the real host loader sustains this rate via the threaded prefetcher.

Prints ONE JSON line:
    {"metric": "frame_pairs_per_sec_per_chip", "value": N,
     "unit": "pairs/s/chip", "vs_baseline": N / 5000.0}
(5000 pairs/s/chip is the BASELINE.json north-star target; the upstream
reference publishes no numbers — BASELINE.md.)
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np
import yaml

from __graft_entry__ import _FLAGSHIP, _raw_batch
from deeplio_tpu.config import load_config_dict
from deeplio_tpu.losses import init_loss_params
from deeplio_tpu.models import init_model
from deeplio_tpu.parallel import make_mesh, replicate, shard_batch
from deeplio_tpu.train import build_train_step, create_train_state, make_optimizer

BATCH = 16
WARMUP = 3
ITERS = 20
TARGET = 5000.0


def main():
    cfg = load_config_dict(yaml.safe_load(_FLAGSHIP))
    n_chips = len(jax.devices())
    mesh = make_mesh(data=-1)

    tx = make_optimizer(cfg.optim, 1000)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), axis_name="data")
    state = create_train_state(variables, init_loss_params(cfg.loss), tx,
                               jax.random.PRNGKey(1))
    state = replicate(mesh, state)
    train_step, _ = build_train_step(cfg, model, tx, mesh)

    batch_size = BATCH * n_chips
    batches = [shard_batch(mesh, _raw_batch(cfg, batch_size, seed=s))
               for s in range(4)]

    for i in range(WARMUP):
        state, m = train_step(state, batches[i % 4])
    # NOTE: on the axon backend jax.block_until_ready can return before the
    # computation finishes; jax.device_get of a value is the reliable sync.
    assert np.isfinite(float(jax.device_get(m["loss"])))

    t0 = time.time()
    for i in range(ITERS):
        state, m = train_step(state, batches[i % 4])
    final_loss = float(jax.device_get(m["loss"]))  # forces the full chain
    dt = (time.time() - t0) / ITERS
    assert np.isfinite(final_loss)
    assert int(jax.device_get(state.step)) == WARMUP + ITERS

    pairs = batch_size * cfg.datasets.num_pairs
    value = pairs / dt / n_chips
    print(json.dumps({
        "metric": "frame_pairs_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
