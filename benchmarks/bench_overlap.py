"""Decision record: does XLA:TPU interleave an independent projection
with the model's fwd+bwd in ONE program? (It does NOT.)

Measures: (a) projection alone, (b) model fwd+bwd alone, (c) one program
computing BOTH on independent inputs — the shape of a software-pipelined
train step (project batch t while training on batch t-1's images). If
t_c < t_a + t_b, cross-step pipelining buys real overlap.

MEASURED (v5e, 2026-08-17): a=24.2ms b=30.2ms c=50.2ms — overlap saves
only ~4ms (~8%), and the production fused-sequential step already runs at
the same ~50ms, i.e. it captures the same scheduling slack. The TPU core
executes one op at a time; there is no GPU-style concurrent-stream
execution for independent subgraphs. A full pipelined train step
(prime/staged/flush machinery in step.py+loop.py+bench.py) was built,
benched at 2528 pairs/s vs 2559 sequential, and REVERTED.

Pitfall this file documents (first run claimed a fictitious 22ms overlap):
a jax.value_and_grad whose gradient is not a live OUTPUT of the jitted
program is dead code — XLA deletes the whole backward pass, so (c) was
comparing fwd-only+projection against fwd+bwd-alone sums.

Run: python benchmarks/bench_overlap.py [--shardmap]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import yaml

from common import project_frames
from __graft_entry__ import _FLAGSHIP, _raw_batch
from deeplio_tpu.config import load_config_dict
from deeplio_tpu.models import init_model
from deeplio_tpu.ops.projection import make_projector
from deeplio_tpu.utils.timing import time_fn

B = 16
ITERS = 10


def main():
    cfg = load_config_dict(yaml.safe_load(_FLAGSHIP))
    ds = cfg.datasets
    n_pairs = B * ds.num_pairs
    projector = make_projector(ds.projection, ds.channels, ds.mean, ds.std,
                               layout="planes")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    raws = [{k: jax.device_put(v) for k, v in _raw_batch(cfg, B, seed=s).items()}
            for s in range(3)]

    @jax.jit
    def make_mb(raw):
        imgs, _ = project_frames(projector, raw)
        pairs = [jnp.concatenate([imgs[:, i], imgs[:, j]], axis=-1)
                 for (i, j) in ds.effective_combinations]
        return {"images": jnp.stack(pairs, axis=1),
                "imu": raw["imu"], "imu_mask": raw["imu_mask"]}

    mbs = [make_mb(r) for r in raws]
    jax.block_until_ready(mbs)

    def model_loss(p, mb, key):
        outs, _ = model.apply({"params": p, **({"batch_stats": stats} if stats
                                               else {})},
                              mb, train=True, rngs={"dropout": key},
                              mutable=["batch_stats"] if stats else [])
        x, q = outs
        return jnp.sum(x.astype(jnp.float32)) + jnp.sum(q.astype(jnp.float32))

    key = jax.random.PRNGKey(2)

    # (a) projection alone
    @jax.jit
    def proj_only(raw):
        imgs, _ = project_frames(projector, raw)
        return imgs

    t_a = time_fn(lambda r: jnp.sum(proj_only(r).astype(jnp.float32)),
                  raws, iters=ITERS)
    print(f"(a) projection:      {t_a*1e3:7.1f} ms", flush=True)

    # (b) model fwd+bwd alone
    grad = jax.jit(jax.value_and_grad(model_loss))
    t_b = time_fn(lambda mb: grad(params, mb, key)[0], mbs, iters=ITERS)
    print(f"(b) model fwd+bwd:   {t_b*1e3:7.1f} ms", flush=True)

    # (c) both in one program, independent inputs. The gradient must be a
    # live OUTPUT: an unused g inside jit is dead code and XLA deletes the
    # whole backward (first version of this experiment measured exactly
    # that — fwd+projection — and reported a fictitious 22ms overlap).
    @jax.jit
    def combined(p, mb, raw):
        v, g = jax.value_and_grad(model_loss)(p, mb, key)
        gsum = sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(g))
        imgs, _ = project_frames(projector, raw)
        return v + 0.0 * gsum, imgs

    def run_c(i):
        v, imgs = combined(params, mbs[i], raws[(i + 1) % 3])
        return v

    t_c = time_fn(run_c, [0, 1, 2], iters=ITERS)
    print(f"(c) combined:        {t_c*1e3:7.1f} ms   "
          f"(sum a+b = {(t_a+t_b)*1e3:.1f} ms, overlap saves "
          f"{(t_a+t_b-t_c)*1e3:.1f} ms)", flush=True)
    print(f"pipelined step would run {n_pairs/t_c:.0f} pairs/s vs "
          f"{n_pairs/(t_a+t_b):.0f} sequential", flush=True)


if __name__ == "__main__" and "--shardmap" not in sys.argv:
    main()


def shardmap_variant():
    """(d): same combined program under a 1-device shard_map, as the real
    train step builds it — isolates whether shard_map blocks the overlap."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from deeplio_tpu.parallel import make_mesh, shard_batch

    cfg = load_config_dict(yaml.safe_load(_FLAGSHIP))
    ds = cfg.datasets
    projector = make_projector(ds.projection, ds.channels, ds.mean, ds.std,
                               layout="planes")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), axis_name="data")
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    mesh = make_mesh(data=-1)
    key = jax.random.PRNGKey(2)

    raws = [shard_batch(mesh, _raw_batch(cfg, B, seed=s)) for s in range(3)]

    def stage(raw):
        imgs, _ = project_frames(projector, raw)
        pairs = [jnp.concatenate([imgs[:, i], imgs[:, j]], axis=-1)
                 for (i, j) in ds.effective_combinations]
        return {"images": jnp.stack(pairs, axis=1),
                "imu": raw["imu"], "imu_mask": raw["imu_mask"]}

    def model_loss(p, mb, key):
        outs, _ = model.apply({"params": p, **({"batch_stats": stats} if stats
                                               else {})},
                              mb, train=True, rngs={"dropout": key},
                              mutable=["batch_stats"] if stats else [])
        x, q = outs
        return jnp.sum(x.astype(jnp.float32)) + jnp.sum(q.astype(jnp.float32))

    def body(p, mb, raw):
        v, g = jax.value_and_grad(model_loss)(p, mb, key)
        return v, stage(raw)

    combined = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P("data")),
        check_vma=False))

    mb0 = jax.jit(jax.shard_map(
        stage, mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
        check_vma=False))(raws[0])
    mbs = [mb0]
    for r in raws[1:]:
        v, mb = combined(params, mbs[-1], r)
        mbs.append(mb)
    jax.block_until_ready(mbs)

    def run_d(i):
        v, _ = combined(params, mbs[i], raws[(i + 1) % 3])
        return v

    t_d = time_fn(run_d, [0, 1, 2], iters=ITERS)
    print(f"(d) combined+shard_map: {t_d*1e3:7.1f} ms", flush=True)


if __name__ == "__main__" and "--shardmap" in sys.argv:
    shardmap_variant()
