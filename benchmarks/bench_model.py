"""Component-level fwd+bwd profiling of the flagship model.

Breaks the bench.py step into its compute stages so optimization targets
the right kernel (docs/performance.md rules: device_get sync, distinct
input buffers, scalar in-graph outputs). Run:

    python benchmarks/bench_model.py [--batch 16]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from common import project_frames
from __graft_entry__ import _FLAGSHIP, _raw_batch
from deeplio_tpu.config import load_config_dict
from deeplio_tpu.losses import init_loss_params
from deeplio_tpu.models import init_model
from deeplio_tpu.ops.projection import make_projector
from deeplio_tpu.parallel import make_mesh, replicate, shard_batch
from deeplio_tpu.train import build_train_step, create_train_state, make_optimizer
from deeplio_tpu.utils.timing import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    cfg = load_config_dict(yaml.safe_load(_FLAGSHIP))
    ds = cfg.datasets
    B = args.batch
    S, P = ds.sequence_size, ds.num_pairs
    n_pairs = B * P

    mesh = mesh = make_mesh(data=-1)
    tx = make_optimizer(cfg.optim, 1000)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), axis_name="data")
    state = create_train_state(variables, init_loss_params(cfg.loss), tx,
                               jax.random.PRNGKey(1))
    state_r = replicate(mesh, state)
    train_step, _ = build_train_step(cfg, model, tx, mesh)

    raws = [_raw_batch(cfg, B, seed=s) for s in range(3)]
    sharded = [shard_batch(mesh, r) for r in raws]

    # Keep an undonated copy of the params for the standalone stages (the
    # full-step loop donates state buffers).
    import jax.numpy as _jnp
    keep_params = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))(
        state.params)
    keep_stats = state.batch_stats

    # 1) full step
    st = state_r

    def full(b):
        nonlocal st
        st, m = train_step(st, b)
        return m["loss"]

    t_full = time_fn(full, sharded, iters=args.iters)
    print(f"full step:            {t_full*1e3:8.1f} ms  "
          f"{n_pairs/t_full:7.0f} pairs/s")

    # 2) projection alone (S frames per window)
    projector = make_projector(ds.projection, ds.channels, ds.mean, ds.std,
                               layout="planes")

    @jax.jit
    def proj_only(raw):
        imgs, _ = project_frames(projector, raw)
        return jnp.sum(imgs.astype(jnp.float32))

    dev_raws = [{k: jax.device_put(v) for k, v in r.items()} for r in raws]
    t_proj = time_fn(proj_only, dev_raws, iters=args.iters)
    print(f"projection ({B*S:3d} scans): {t_proj*1e3:8.1f} ms  "
          f"{B*S/t_proj:7.0f} scans/s")

    # 3) model fwd+bwd on pre-projected images (no projection in graph)
    @jax.jit
    def make_mb(raw):
        imgs, _ = project_frames(projector, raw)
        pairs = [jnp.concatenate([imgs[:, i], imgs[:, j]], axis=-1)
                 for (i, j) in ds.effective_combinations]
        return {"images": jnp.stack(pairs, axis=1),
                "imu": raw["imu"], "imu_mask": raw["imu_mask"]}

    # Keep batches device-resident (a D2H of the 335MB image stack through
    # the relay takes minutes); distinct raws give distinct buffers.
    mbs = [make_mb(r) for r in dev_raws]
    jax.block_until_ready(mbs)

    def fwdbwd_fn(apply_fn):
        def loss_of(params, mb, key):
            variables = {"params": params, **({"batch_stats": keep_stats}
                                              if keep_stats else {})}
            out = apply_fn(variables, mb, key)
            return out
        grad = jax.jit(jax.value_and_grad(loss_of))

        def run(mb):
            v, g = grad(keep_params, mb, jax.random.PRNGKey(2))
            return v
        return run

    # No axis_name here: BatchNorm pmean would need shard_map.
    model_na, _ = init_model(cfg, jax.random.PRNGKey(0))

    def full_apply(variables, mb, key):
        outs, _ = model_na.apply(variables, mb, train=True,
                              rngs={"dropout": key},
                              mutable=["batch_stats"])
        x, q = outs
        return jnp.sum(x.astype(jnp.float32)) + jnp.sum(q.astype(jnp.float32))

    t_model = time_fn(fwdbwd_fn(full_apply), mbs, iters=args.iters)
    print(f"model fwd+bwd:        {t_model*1e3:8.1f} ms  "
          f"{n_pairs/t_model:7.0f} pairs/s")

    # 4) lidar tower alone fwd+bwd (flattened pairs)
    from deeplio_tpu.models.zoo import _dtype_of, _make_lidar_net
    lidar = _make_lidar_net(cfg.model, _dtype_of(cfg.model.compute_dtype),
                            axis_name=None)
    imgs_flat = [mb["images"].reshape(-1, *mb["images"].shape[2:]) for mb in mbs]
    lvars = lidar.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros_like(jax.device_get(imgs_flat[0][:2])),
                       train=False)
    lparams = lvars["params"]
    lstats = lvars.get("batch_stats")

    def lidar_loss(params, x, key):
        variables = {"params": params, **({"batch_stats": lstats} if lstats else {})}
        out, _ = lidar.apply(variables, x, train=True,
                             rngs={"dropout": key}, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    lgrad = jax.jit(jax.value_and_grad(lidar_loss))

    def lidar_run(x):
        v, g = lgrad(lparams, x, jax.random.PRNGKey(2))
        return v

    t_lidar = time_fn(lidar_run, imgs_flat, iters=args.iters)
    print(f"lidar tower fwd+bwd:  {t_lidar*1e3:8.1f} ms  "
          f"{n_pairs/t_lidar:7.0f} pairs/s")

    # 5) everything-but-lidar estimate
    print(f"residual (rnn/fusion/heads/loss/opt): "
          f"{(t_full - t_proj - t_lidar)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
