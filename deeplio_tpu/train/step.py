"""The compiled training/eval step: projection + forward + loss + backward
+ update as ONE XLA program under shard_map data parallelism.

This fuses the reference's entire per-batch hot path (SURVEY.md §3.1 hot
loops #1-#3: worker-process numpy projection, model forward, autograd
backward) into a single jitted function. Gradients are psum-averaged over
the ``data`` mesh axis (XLA collectives over ICI — the reference has no
distributed backend at all, SURVEY.md §2.7).

Raw batch contract (host pipeline output; everything static-shaped):
    points_x/points_y/points_z/points_rem: [B*S, N] float32 (lidar
                  archs; S window frames per item, FLAT — SoA channel
                  planes; separate natively-tiled arrays feed the Mosaic
                  projection prologue with no relayout copy. An AoS
                  [B,S,N,4] "points" or a single [B,S,4,N] array forces a
                  ~0.9 ms/step re-tiling copy, and [B,S,N] planes
                  materialize ~0.4 ms (B,S)-merge reshapes per kernel
                  operand — the flat host view is free. docs/performance.md)
    points_valid: [B*S, N]   bool
    imu:          [B, P, T, 6] float32   (imu archs)
    imu_mask:     [B, P, T]   float32
    x_gt:         [B, P, 3],  q_gt: [B, P, 4],  valid: [B, P]

The projector runs on the S frames once; pair images are channel-concats
of the P configured (i, j) combinations — frames shared between pairs are
projected exactly once (unlike the reference, which re-projects per item).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from deeplio_tpu.config.schema import Config
from deeplio_tpu.losses import pose_loss
from deeplio_tpu.ops.augment import yaw_augment
from deeplio_tpu.ops.projection import make_projector
from deeplio_tpu.parallel.mesh import DATA_AXIS, Mesh
from deeplio_tpu.train.state import TrainState

Batch = Dict[str, jax.Array]


def make_model_batch(cfg: Config, projector, raw: Batch) -> Batch:
    """Raw points/imu -> the model zoo's batch dict (in-graph).

    When the batch already carries per-frame ``images`` (projection cache,
    data/proj_cache.py) the projection stage is skipped.
    """
    mb: Batch = {}
    if cfg.model.arch in ("deeplo", "deeplio"):
        if "images" in raw:
            from deeplio_tpu.models.zoo import _dtype_of
            # Cached f16 images go straight to the compute dtype — building
            # the pair stack in f32 would double the step's largest tensor.
            imgs = raw["images"].astype(_dtype_of(cfg.model.compute_dtype))
        else:
            imgs, _ = projector(
                (raw["points_x"], raw["points_y"],
                 raw["points_z"], raw["points_rem"]),
                raw["points_valid"])
            # [B*S, H, W, C] -> [B, S, H, W, C]: dim-0 split, layout-free.
            b = raw["x_gt"].shape[0]
            imgs = imgs.reshape((b, -1) + imgs.shape[1:])
        lc = cfg.model.lidar
        if lc is not None and lc.stem == "factorized":
            # Factorized stem consumes per-frame images directly — the
            # full-resolution [B, P, H, W, 2C] pair stack (the step's
            # largest materialization) is never built; pairs are summed
            # post-stem on the downsampled grid (blocks.FactorizedStem).
            mb["frames"] = imgs                                  # [B,S,H,W,C]
        elif lc is not None and lc.stem == "s2d-pre":
            # Emit the pair stack already in space-to-depth layout so XLA
            # can fuse the relayout into the projection epilogue / pair
            # assembly writes — the full-res pair stack is never built and
            # the stem reads h*w*2C lane-packed channels instead of a
            # ~10-channel tensor padded to the 128-lane width.
            from deeplio_tpu.models.blocks import space_to_depth_pairs
            mb["images"] = space_to_depth_pairs(
                imgs, cfg.datasets.effective_combinations,
                lc.h_stride, lc.w_stride)          # [B,P,H/h,W/w,h*w*2C]
        elif lc is not None and lc.stem == "pair-split":
            # The pair CONCAT never materializes: ship the frame-i and
            # frame-j stacks separately and let the stem's input-split
            # conv (blocks.SplitInputConv) consume both — deletes the
            # step's largest copy chain (the [B*P,H,W,2C] stack + its
            # conv-input relayout; docs/performance.md round-5 budget).
            combos = cfg.datasets.effective_combinations
            if all(c == (k, k + 1) for k, c in enumerate(combos)):
                # consecutive pairs (the default window combos): the
                # stacks are pure frame-range SLICES — no gather/stack
                # op for XLA to materialize.
                p = len(combos)
                mb["images"] = imgs[:, :p]                      # [B,P,H,W,C]
                mb["images2"] = imgs[:, 1:p + 1]                # [B,P,H,W,C]
            else:
                mb["images"] = jnp.stack([imgs[:, i] for i, _ in combos],
                                         axis=1)                # [B,P,H,W,C]
                mb["images2"] = jnp.stack([imgs[:, j] for _, j in combos],
                                          axis=1)               # [B,P,H,W,C]
        else:
            pairs = []
            for (i, j) in cfg.datasets.effective_combinations:
                pairs.append(
                    jnp.concatenate([imgs[:, i], imgs[:, j]], axis=-1))
            mb["images"] = jnp.stack(pairs, axis=1)              # [B,P,H,W,2C]
    if cfg.model.arch in ("deepio", "deeplio"):
        mb["imu"] = raw["imu"]
        mb["imu_mask"] = raw["imu_mask"]
    return mb


def build_train_step(
    cfg: Config,
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    steps_per_call: int = 1,
) -> Tuple[Callable, Callable]:
    """Returns (train_step, eval_step), both jitted shard_map programs.

    train_step(state, raw_batch) -> (state, metrics)   [state donated]
    eval_step(state, raw_batch)  -> (x_pred, q_pred, metrics)

    With ``steps_per_call = k > 1`` the returned train_step instead takes
    k raw batches and runs k optimizer steps in ONE compiled program:
    train_step(state, raw_0, ..., raw_{k-1}) -> (state, (m_0, ..., m_{k-1}))
    """
    from deeplio_tpu.models.zoo import _dtype_of

    ds = cfg.datasets
    projector = make_projector(ds.projection, ds.channels, ds.mean, ds.std,
                               out_dtype=_dtype_of(cfg.model.compute_dtype),
                               layout="planes")

    def _loss_fn(trainables, batch_stats, raw, dropout_rng):
        variables = {"params": trainables["model"]}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mb = make_model_batch(cfg, projector, raw)
        outs, mut = model.apply(
            variables, mb, train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"] if batch_stats else [],
        )
        x_pred, q_pred = outs
        total, metrics = pose_loss(
            cfg.loss, trainables["loss"], x_pred, q_pred,
            raw["x_gt"], raw["q_gt"], raw.get("valid"))
        new_stats = mut.get("batch_stats", batch_stats) if batch_stats else {}
        return total, (metrics, new_stats)

    def _train_step(state: TrainState, raw: Batch):
        rng, sub = jax.random.split(state.rng)
        # Different dropout/augmentation per data shard.
        sub = jax.random.fold_in(sub, jax.lax.axis_index(DATA_AXIS))
        if ds.augment_yaw:
            aug_rng, sub = jax.random.split(sub)
            raw = yaw_augment(raw, aug_rng)
        grads, (metrics, new_stats) = jax.grad(_loss_fn, has_aux=True)(
            state.trainables, state.batch_stats, raw, sub)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        if cfg.optim.flat_update:
            # One raveled vector for update + apply: Adam's moment math and
            # the `w + u` apply are elementwise, so the math is identical
            # per element to the per-leaf path (params agree to last-ulp
            # f32 — shifted fusion rounding, tests/distributed/
            # test_shard_map.py) while XLA emits a few large contiguous
            # fusions instead of ~a hundred per-leaf (w, m, v) tuple
            # fusions (docs/performance.md round-4 profile). The opt_state
            # was created flat (state.create_train_state).
            from deeplio_tpu.train.state import ravel_trainables
            flat_g, _ = ravel_trainables(grads)
            flat_t, unravel = ravel_trainables(state.trainables)
            flat_u, new_opt = tx.update(flat_g, state.opt_state, flat_t)
            new_trainables = unravel(flat_t + flat_u)
        else:
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.trainables)
            new_trainables = optax.apply_updates(state.trainables, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_trainables["model"],
            loss_params=new_trainables["loss"],
            batch_stats=new_stats,
            opt_state=new_opt,
            rng=rng,
        )
        return new_state, metrics

    def _eval_step(state: TrainState, raw: Batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        mb = make_model_batch(cfg, projector, raw)
        x_pred, q_pred = model.apply(variables, mb, train=False)
        _, metrics = pose_loss(
            cfg.loss, state.loss_params, x_pred, q_pred,
            raw["x_gt"], raw["q_gt"], raw.get("valid"))
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        # Predictions come back REPLICATED (tiled all_gather over the data
        # axis): multi-host trajectory evaluation device_gets them on every
        # process, and P(data)-sharded outputs are not addressable off
        # their owning host. The gathered arrays are tiny ([B, P, 3/4]).
        x_pred = jax.lax.all_gather(x_pred, DATA_AXIS, axis=0, tiled=True)
        q_pred = jax.lax.all_gather(q_pred, DATA_AXIS, axis=0, tiled=True)
        return x_pred, q_pred, metrics

    train_step = jax.jit(
        jax.shard_map(
            _train_step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        ),
        donate_argnums=0,
    )
    spc = int(steps_per_call or 1)
    if spc > 1:
        # k optimizer steps per compiled program (UNROLLED — a lax.scan
        # would need the microbatches stacked, and stacking k sharded
        # batches is a full device copy that eats the win; unrolling keeps
        # each batch's existing P(data) sharding untouched). Amortizes the
        # per-program host dispatch (~1-2 ms/call through the axon relay).
        # Same ops and rng chain as k sequential train_step calls; params
        # agree to last-ulp f32 (different XLA program, shifted fusion
        # rounding — tests/distributed/test_shard_map.py).
        def _multi(state: TrainState, *raws):
            ms = []
            for raw in raws:
                state, m = _train_step(state, raw)
                ms.append(m)
            return state, tuple(ms)

        train_step = jax.jit(
            jax.shard_map(
                _multi, mesh=mesh,
                in_specs=(P(),) + (P(DATA_AXIS),) * spc,
                out_specs=(P(), tuple(P() for _ in range(spc))),
                check_vma=False,
            ),
            donate_argnums=0,
        )
    eval_step = jax.jit(
        jax.shard_map(
            _eval_step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
    return train_step, eval_step
