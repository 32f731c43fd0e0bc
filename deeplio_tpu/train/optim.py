"""Optimizer/schedule factory from config (reference: Adam/SGD + LR
scheduler built in the trainer — SURVEY.md §2.5)."""

from __future__ import annotations

import optax

from deeplio_tpu.config.schema import OptimConfig


def make_schedule(cfg: OptimConfig, steps_per_epoch: int = 1000):
    base = cfg.lr
    if cfg.scheduler == "none":
        sched = optax.constant_schedule(base)
    elif cfg.scheduler == "step":
        sched = optax.exponential_decay(
            base, transition_steps=cfg.step_size * steps_per_epoch,
            decay_rate=cfg.gamma, staircase=True)
    elif cfg.scheduler == "cosine":
        sched = optax.cosine_decay_schedule(
            base, decay_steps=max(cfg.step_size * steps_per_epoch, 1))
    else:
        raise ValueError(f"unknown scheduler '{cfg.scheduler}'")
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base, cfg.warmup_steps)
        sched = optax.join_schedules([warm, sched], [cfg.warmup_steps])
    return sched


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int = 1000
                   ) -> optax.GradientTransformation:
    sched = make_schedule(cfg, steps_per_epoch)
    if cfg.name == "adam":
        if cfg.weight_decay > 0:
            tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
        else:
            tx = optax.adam(sched)
    elif cfg.name == "sgd":
        tx = optax.sgd(sched, momentum=cfg.momentum)
        if cfg.weight_decay > 0:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    else:
        raise ValueError(f"unknown optimizer '{cfg.name}' (want adam|sgd)")
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx
