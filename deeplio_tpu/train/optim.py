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
    if cfg.scheduler == "plateau":
        # Stateful-on-val-loss scheduling can't be a pure step schedule;
        # the lr lives in opt_state.hyperparams (inject_hyperparams) and
        # the trainer's PlateauController rewrites it at validation time —
        # torch ReduceLROnPlateau semantics (SURVEY.md §2.5 scheduler row).
        # A step-indexed warmup cannot coexist with that rewrite, so
        # reject the combination loudly instead of silently ignoring it.
        if cfg.warmup_steps > 0:
            raise ValueError(
                "scheduler=plateau is incompatible with warmup-steps "
                "(the plateau controller rewrites a constant injected lr)")
        sched = cfg.lr
    else:
        sched = make_schedule(cfg, steps_per_epoch)

    def base_tx(learning_rate):
        if cfg.name == "adam":
            if cfg.weight_decay > 0:
                return optax.adamw(learning_rate,
                                   weight_decay=cfg.weight_decay)
            return optax.adam(learning_rate)
        if cfg.name == "sgd":
            tx = optax.sgd(learning_rate, momentum=cfg.momentum)
            if cfg.weight_decay > 0:
                tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                                 tx)
            return tx
        raise ValueError(f"unknown optimizer '{cfg.name}' (want adam|sgd)")

    if cfg.scheduler == "plateau":
        tx = optax.inject_hyperparams(
            lambda learning_rate: base_tx(learning_rate))(learning_rate=sched)
    else:
        tx = base_tx(sched)
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


class PlateauController:
    """Host-side ReduceLROnPlateau over the injected lr hyperparam.

    The trainer calls :meth:`observe` after every validation; when the
    val loss hasn't improved for ``patience`` observations the lr leaf in
    ``opt_state.hyperparams`` is scaled by ``gamma`` (floored at
    ``min_lr``) — exactly torch's scheduler contract, applied to the
    replicated device state.
    """

    def __init__(self, cfg: OptimConfig):
        self.enabled = cfg.scheduler == "plateau"
        self.gamma = cfg.gamma
        self.patience = cfg.patience
        self.min_lr = cfg.min_lr
        self.threshold = cfg.threshold
        self.best = float("inf")
        self.bad = 0
        self.lr = cfg.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "bad": self.bad}

    def restore_state(self, d) -> None:
        if not d:
            return
        self.lr = float(d.get("lr", self.lr))
        self.best = float(d.get("best", self.best))
        self.bad = int(d.get("bad", self.bad))

    def observe(self, val_loss: float, opt_state):
        """Returns (possibly updated) opt_state."""
        if not self.enabled:
            return opt_state
        if val_loss < self.best - self.threshold:
            self.best = val_loss
            self.bad = 0
            return opt_state
        self.bad += 1
        if self.bad < self.patience:
            return opt_state
        self.bad = 0
        new_lr = max(self.lr * self.gamma, self.min_lr)
        if new_lr == self.lr:
            return opt_state
        self.lr = new_lr
        return _set_injected_lr(opt_state, new_lr)


def _set_injected_lr(opt_state, new_lr: float):
    """Rewrite the learning_rate leaf of an InjectHyperparamsState found
    anywhere in a (possibly chained) opt_state tuple."""
    import jax.numpy as jnp

    import jax

    if hasattr(opt_state, "hyperparams") and \
            "learning_rate" in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        old = hp["learning_rate"]
        new = jnp.asarray(new_lr, dtype=old.dtype)
        # Keep the leaf's global (replicated) sharding: a host-local array
        # in a donated multi-host train_step input would mismatch the
        # expected layout (single-host jit reshards; multi-host cannot).
        if hasattr(old, "sharding"):
            new = jax.device_put(new, old.sharding)
        hp["learning_rate"] = new
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, tuple):
        parts = [_set_injected_lr(s, new_lr) for s in opt_state]
        # NamedTuple states reconstruct positionally; plain tuples don't.
        if hasattr(opt_state, "_fields"):
            return type(opt_state)(*parts)
        return tuple(parts)
    return opt_state
