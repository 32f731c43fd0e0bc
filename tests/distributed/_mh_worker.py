"""Multi-host worker: one train step on a 2-process CPU cluster.

Launched as a subprocess by test_multihost.py (never imported by pytest):

    python _mh_worker.py <process_id> <num_processes> <port> <outdir>

Each process sees 4 local fake CPU devices (8 global), builds the global
mesh, feeds ONLY its slice of the deterministic global batch through the
real dataset->prefetcher path, runs one compiled train step, and dumps the
updated params + loss to <outdir>/p<id>.npz for the parent to compare
against a single-process 8-device run.
"""

import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
arch = sys.argv[5] if len(sys.argv) > 5 else "deepio"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

from _mh_common import make_cfg  # noqa: E402
from deeplio_tpu.data.dataset import build_dataset  # noqa: E402
from deeplio_tpu.data.pipeline import DevicePrefetcher  # noqa: E402
from deeplio_tpu.losses import init_loss_params  # noqa: E402
from deeplio_tpu.models import init_model  # noqa: E402
from deeplio_tpu.parallel import make_mesh, maybe_initialize, replicate  # noqa: E402
from deeplio_tpu.train import (  # noqa: E402
    build_train_step, create_train_state, make_optimizer)

GLOBAL_BATCH = 8


def main():
    assert maybe_initialize(coordinator=f"localhost:{port}",
                            num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    cfg = make_cfg(arch)
    mesh = make_mesh(data=8)
    tx = make_optimizer(cfg.optim, 100)
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  axis_name="data")
    state = create_train_state(variables, init_loss_params(cfg.loss), tx,
                               jax.random.PRNGKey(1))
    state = replicate(mesh, state)
    train_step, _ = build_train_step(cfg, model, tx, mesh)

    ds = build_dataset(cfg, "train")
    it = DevicePrefetcher(
        ds.iter_batches(GLOBAL_BATCH, shuffle=True, seed=7,
                        process_index=jax.process_index(),
                        process_count=jax.process_count()),
        mesh, global_batch_size=GLOBAL_BATCH)
    batch = next(iter(it))
    assert batch["imu"].shape[0] == GLOBAL_BATCH  # global view
    if "points_x" in batch:  # flat SoA plane keys: global [B*S, N] rows
        S = cfg.datasets.sequence_size
        assert batch["points_x"].shape[0] == GLOBAL_BATCH * S
    state, metrics = train_step(state, batch)

    # Fully-replicated outputs: process-local device_get is the global value.
    flat = np.concatenate([np.asarray(jax.device_get(x)).ravel()
                           for x in jax.tree_util.tree_leaves(state.params)])
    np.savez(os.path.join(outdir, f"p{pid}.npz"), params=flat,
             loss=float(jax.device_get(metrics["loss"])))
    print(f"[p{pid}] OK loss={float(jax.device_get(metrics['loss'])):.6f}",
          flush=True)


if __name__ == "__main__":
    main()
