"""Shared setup for the benchmark harnesses (bench_batch_sweep,
bench_stem_ab, profile_step).

One copy of the two recipes every harness needs:

* ``setup_state(cfg, mesh)`` — host-CPU probe init (bit-identical to the
  full init, see models/zoo.py::init_model_fast) with the persistent
  compile cache disabled around it (stale cross-machine CPU AOT artifacts
  risk SIGILL — the same hazard bench.py guards), then replicate onto the
  mesh.
* ``stage_batches(mesh, raw, n)`` — ONE host->device transfer, further
  distinct buffers via jitted device-side batch rolls (measurement rule 3
  in docs/performance.md; re-staging was the relay-timeout hazard).

bench.py deliberately does NOT import this module: it is the driver's
contract entry point and stays self-contained so a benchmarks/ refactor
can never break the graded artifact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeplio_tpu.losses import init_loss_params
from deeplio_tpu.models import init_model_fast
from deeplio_tpu.parallel import replicate, shard_batch
from deeplio_tpu.train import create_train_state, make_optimizer


def setup_state(cfg, mesh, lr_steps: int = 1000, probe_width: int = 64):
    """Build (model, replicated TrainState, tx) with host-CPU param init."""
    tx = make_optimizer(cfg.optim, lr_steps)
    old_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            model, variables = init_model_fast(
                cfg, jax.random.PRNGKey(0), axis_name="data",
                probe_width=probe_width)
            state = create_train_state(variables, init_loss_params(cfg.loss),
                                       tx, jax.random.PRNGKey(1))
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
    return model, replicate(mesh, state), tx


def project_frames(projector, raw):
    """Project a raw flat-plane batch to per-window frame images.

    The loader contract (data/dataset.py::_FLAT_KEYS) ships point planes
    flat as [B*S, N]; the projector consumes them directly and the
    result is viewed back to [B, S, H, W, C] using a window-level key's
    leading dim. One copy of this recipe so a plane-contract change
    can't leave a harness silently benchmarking a stale layout.
    """
    imgs, mask = projector(
        (raw["points_x"], raw["points_y"],
         raw["points_z"], raw["points_rem"]), raw["points_valid"])
    imgs = imgs.reshape((raw["x_gt"].shape[0], -1) + imgs.shape[1:])
    return imgs, mask


def stage_batches(mesh, raw, n: int = 3):
    """Shard one raw host batch, derive n-1 more by device-side rolls."""
    roll = jax.jit(
        lambda b, s: {k: jnp.roll(v, s, axis=0) for k, v in b.items()},
        static_argnums=1)
    batches = [shard_batch(mesh, raw)]
    batches += [roll(batches[0], s) for s in range(1, n)]
    return batches
