"""Optimizer/scheduler factory tests, incl. the plateau scheduler
(SURVEY.md §2.5 lists step/plateau; VERDICT r1 missing #6)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeplio_tpu.config.schema import OptimConfig
from deeplio_tpu.train.optim import (PlateauController, _set_injected_lr,
                                     make_optimizer, make_schedule)


def _plateau_cfg(**kw):
    return OptimConfig(name="adam", lr=1e-3, scheduler="plateau",
                       gamma=0.5, patience=2, min_lr=1e-5, **kw)


def _injected_lr(opt_state) -> float:
    if hasattr(opt_state, "hyperparams"):
        return float(opt_state.hyperparams["learning_rate"])
    assert isinstance(opt_state, tuple)
    for s in opt_state:
        try:
            return _injected_lr(s)
        except (AssertionError, TypeError):
            continue
    raise AssertionError("no injected lr found")


class TestPlateau:
    def test_lr_drops_after_patience_without_improvement(self):
        cfg = _plateau_cfg()
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones(3)}
        opt_state = tx.init(params)
        assert _injected_lr(opt_state) == pytest.approx(1e-3)

        ctl = PlateauController(cfg)
        opt_state = ctl.observe(1.0, opt_state)   # best
        opt_state = ctl.observe(1.0, opt_state)   # bad 1
        assert _injected_lr(opt_state) == pytest.approx(1e-3)
        opt_state = ctl.observe(1.0, opt_state)   # bad 2 -> reduce
        assert _injected_lr(opt_state) == pytest.approx(5e-4)

    def test_improvement_resets_patience(self):
        cfg = _plateau_cfg()
        tx = make_optimizer(cfg)
        opt_state = tx.init({"w": jnp.ones(2)})
        ctl = PlateauController(cfg)
        opt_state = ctl.observe(1.0, opt_state)
        opt_state = ctl.observe(1.1, opt_state)   # bad 1
        opt_state = ctl.observe(0.5, opt_state)   # improvement resets
        opt_state = ctl.observe(0.6, opt_state)   # bad 1 again
        assert _injected_lr(opt_state) == pytest.approx(1e-3)

    def test_min_lr_floor(self):
        cfg = _plateau_cfg()
        tx = make_optimizer(cfg)
        opt_state = tx.init({"w": jnp.ones(2)})
        ctl = PlateauController(cfg)
        ctl.observe(1.0, opt_state)
        for _ in range(40):
            opt_state = ctl.observe(2.0, opt_state)
        assert _injected_lr(opt_state) == pytest.approx(1e-5)
        assert ctl.lr == pytest.approx(1e-5)

    def test_updated_lr_changes_step_size(self):
        """The rewritten hyperparam must actually change optimization."""
        cfg = _plateau_cfg()
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones(4)}
        grads = {"w": jnp.full(4, 0.5)}
        s0 = tx.init(params)
        up_before, _ = tx.update(grads, s0, params)
        s1 = _set_injected_lr(tx.init(params), 1e-6)
        up_after, _ = tx.update(grads, s1, params)
        n_before = float(optax.global_norm(up_before))
        n_after = float(optax.global_norm(up_after))
        assert n_after < n_before * 1e-2

    def test_grad_clip_composes_with_plateau(self):
        cfg = _plateau_cfg(grad_clip=1.0)
        tx = make_optimizer(cfg)
        opt_state = tx.init({"w": jnp.ones(2)})
        assert _injected_lr(opt_state) == pytest.approx(1e-3)
        ctl = PlateauController(cfg)
        ctl.observe(1.0, opt_state)
        opt_state = ctl.observe(1.0, opt_state)
        opt_state = ctl.observe(1.0, opt_state)
        assert _injected_lr(opt_state) == pytest.approx(5e-4)


class TestSchedules:
    @pytest.mark.parametrize("name", ["none", "step", "cosine"])
    def test_pure_schedules_still_work(self, name):
        cfg = OptimConfig(lr=1e-3, scheduler=name)
        sched = make_schedule(cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1e-3)

    def test_unknown_scheduler_raises(self):
        with pytest.raises(ValueError, match="unknown scheduler"):
            make_schedule(OptimConfig(scheduler="nope"))

    def test_plateau_controller_noop_for_pure_schedules(self):
        cfg = OptimConfig(lr=1e-3, scheduler="cosine")
        ctl = PlateauController(cfg)
        assert not ctl.enabled
        sentinel = object()
        assert ctl.observe(1.0, sentinel) is sentinel


class TestFlatUpdate:
    def test_plateau_rewrite_reaches_flat_opt_state(self):
        """optimizer.flat-update stores the opt_state for a raveled
        vector; the plateau controller's injected-lr rewrite must still
        find the hyperparam leaf inside it and change the update size
        (train/optim.py::_set_injected_lr recurses NamedTuple states)."""
        from deeplio_tpu.train.state import ravel_trainables

        cfg = _plateau_cfg(flat_update=True)
        tx = make_optimizer(cfg)
        params = {"a": jnp.ones(4), "b": jnp.ones((2, 3))}
        flat, unravel = ravel_trainables(params)
        opt_state = tx.init(flat)
        assert _injected_lr(opt_state) == pytest.approx(1e-3)

        grads = jnp.full_like(flat, 0.5)
        up_before, _ = tx.update(grads, opt_state, flat)
        s1 = _set_injected_lr(tx.init(flat), 1e-6)
        up_after, _ = tx.update(grads, s1, flat)
        assert float(optax.global_norm(up_after)) < \
            float(optax.global_norm(up_before)) * 1e-2
        # unravel restores the leaf structure for apply
        tree = unravel(up_before)
        assert tree["a"].shape == (4,) and tree["b"].shape == (2, 3)
