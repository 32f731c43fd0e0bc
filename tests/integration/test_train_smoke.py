"""End-to-end training smoke tests (SURVEY.md §4 item 4): one-epoch train
on the synthetic fixture, loss decreases, checkpoint resume equality —
on the 8-device CPU mesh through the real shard_map train step."""

import os

import jax
import numpy as np
import pytest

from deeplio_tpu.config import load_config
from deeplio_tpu.train import Trainer

pytestmark = [pytest.mark.integration, pytest.mark.slow]


def _small(cfg, **train_over):
    import dataclasses
    tr = dataclasses.replace(cfg.train, **train_over)
    return cfg.replace(train=tr)


def test_deepio_loss_decreases(tmp_path):
    cfg = load_config("configs/deepio_synth.yaml")
    cfg = _small(cfg, epochs=3, batch_size=8, log_every=1,
                 checkpoint_every_steps=0)
    t = Trainer(cfg, workdir=str(tmp_path / "run"))
    t.fit()
    import json
    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    train = [r for r in recs if r["split"] == "train"]
    assert len(train) > 10
    first = np.mean([r["loss"] for r in train[:3]])
    last = np.mean([r["loss"] for r in train[-3:]])
    assert last < first, f"loss did not decrease: {first} -> {last}"
    t.close()


def test_checkpoint_resume_bit_equal(tmp_path):
    cfg = load_config("configs/deepio_synth.yaml")
    cfg = _small(cfg, epochs=1, batch_size=8, checkpoint_every_steps=5,
                 log_every=100)
    wd = str(tmp_path / "run")
    t = Trainer(cfg, workdir=wd)
    t.fit(epochs=1)
    final_step = t.step
    params_end = jax.device_get(t.state.params)
    t.close()

    t2 = Trainer(cfg, workdir=wd, resume=True)
    assert t2.step > 0
    # Restored params from the last saved checkpoint must match the saved
    # state exactly (restore at final forced save == end of training).
    assert t2.step == final_step
    restored = jax.device_get(t2.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), params_end, restored)
    t2.close()


def test_device_dataset_trainer_bit_equal(tmp_path):
    """``train: device-dataset: true`` (data/device_bank.py) must leave
    training RESULTS untouched: same epochs on the host-fed and
    device-resident paths end in bit-equal params (same shuffle order,
    bit-equal batches, same compiled step math)."""
    import dataclasses
    cfg = load_config("configs/deeplo_synth.yaml")
    cfg = cfg.replace(datasets=dataclasses.replace(
        cfg.datasets, synthetic_frames=14))
    cfg = _small(cfg, epochs=2, batch_size=4, log_every=100,
                 checkpoint_every_steps=0, data_parallel=1)
    t1 = Trainer(cfg, workdir=str(tmp_path / "host"))
    t1.fit()
    p_host = jax.device_get(t1.state.params)
    t1.close()

    t2 = Trainer(_small(cfg, device_dataset=True),
                 workdir=str(tmp_path / "bank"))
    assert t2._train_bank is not None
    t2.fit()
    p_bank = jax.device_get(t2.state.params)
    t2.close()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), p_host, p_bank)


def test_steps_per_call_checkpoint_labels_match_state(tmp_path):
    """With steps-per-call k>1 the trainer state only exists at group
    boundaries; every orbax step label must equal the step counter INSIDE
    the saved state (a label naming a state it doesn't contain corrupts
    resume-at-step and best-tracking)."""
    cfg = load_config("configs/deepio_synth.yaml")
    # save boundary (3) falls strictly inside the 4-step groups
    cfg = _small(cfg, epochs=1, batch_size=8, checkpoint_every_steps=3,
                 steps_per_call=4, log_every=100)
    wd = str(tmp_path / "run")
    t = Trainer(cfg, workdir=wd)
    t.fit(epochs=1)
    t.ckpt.wait()
    labels = sorted(t.ckpt._mgr.all_steps())
    assert labels, "no checkpoints saved"
    # Labels must land on group boundaries only (multiples of k, or the
    # final forced save), never on mid-group steps the state skipped over.
    for lbl in labels:
        restored = t.ckpt.restore(t.state, step=lbl)
        assert int(jax.device_get(restored.step)) == lbl
    t.close()


def test_steps_per_call_exceeding_epoch_rejected(tmp_path):
    """A k-step group larger than the whole epoch would silently train
    ZERO steps (every epoch's batches dropped as a short tail) and exit
    rc=0 with an untrained checkpoint — must be a loud config error."""
    cfg = load_config("configs/deepio_synth.yaml")
    n = 64  # synthetic fixture windows (see dataset); batch 32 -> 2 steps
    cfg = _small(cfg, epochs=1, batch_size=32, steps_per_call=64,
                 checkpoint_every_steps=0)
    with pytest.raises(ValueError, match="steps-per-call"):
        Trainer(cfg, workdir=str(tmp_path / "run"))


def test_forced_metrics_save_keeps_sole_checkpoint(tmp_path):
    """The forced-metrics overwrite (delete+resave) must not run when the
    step is the run's ONLY finalized checkpoint — a crash between delete
    and save would lose the sole restore point."""
    from deeplio_tpu.train.checkpoint import CheckpointManager
    from deeplio_tpu.train import create_train_state, make_optimizer
    from deeplio_tpu.losses import init_loss_params
    from deeplio_tpu.models import init_model
    cfg = load_config("configs/deepio_synth.yaml")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    state = create_train_state(variables, init_loss_params(cfg.loss),
                               make_optimizer(cfg.optim, 10),
                               jax.random.PRNGKey(1))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every_steps=5)
    assert mgr.maybe_save(state, step=5)            # metrics-less periodic
    mgr.wait()
    # forced metrics save at the same (only) step: refused, ckpt intact
    assert not mgr.maybe_save(state, metrics={"val_loss": 1.0},
                              force=True, step=5)
    assert mgr.latest_step() == 5
    restored = mgr.restore(state, step=5)
    assert int(jax.device_get(restored.step)) == int(
        jax.device_get(state.step))
    # with a SECOND finalized step, the overwrite path is allowed again
    state10 = state.replace(step=state.step + 10)
    assert mgr.maybe_save(state10, step=10)
    mgr.wait()
    assert mgr.maybe_save(state10, metrics={"val_loss": 0.5},
                          force=True, step=10)
    mgr.wait()
    assert sorted(mgr._mgr.all_steps()) == [5, 10]
    mgr.close()


def test_deeplo_one_step(tmp_path):
    """Lidar path: projection+conv tower through the shard_map step."""
    cfg = load_config("configs/deeplo_synth.yaml")
    import dataclasses
    # Shrink for CPU: tiny image + few points.
    proj = dataclasses.replace(cfg.datasets.projection, height=16, width=128,
                               max_points=2048)
    ds = dataclasses.replace(cfg.datasets, projection=proj, synthetic_frames=12)
    cfg = cfg.replace(datasets=ds)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    cfg = _small(cfg, epochs=1, batch_size=8, log_every=1,
                 checkpoint_every_steps=0)
    t = Trainer(cfg, workdir=str(tmp_path / "run"))
    t.fit(epochs=1)
    assert t.step >= 1
    # Validate eval path too.
    val = t.validate()
    assert np.isfinite(val["loss"])
    t.close()


def test_whole_model_pretrained_load(tmp_path):
    """Reference capability: arch-level model-path warm start."""
    import dataclasses

    import jax
    import numpy as np

    from deeplio_tpu.train.checkpoint import save_params

    cfg = load_config("configs/deepio_synth.yaml")
    cfg = _small(cfg, epochs=1, batch_size=8, checkpoint_every_steps=0)
    t = Trainer(cfg, workdir=str(tmp_path / "a"))
    t.fit(epochs=1)
    trained = jax.device_get(t.state.params)
    save_params(str(tmp_path / "snap"), trained)
    t.close()

    cfg2 = cfg.replace(model=dataclasses.replace(
        cfg.model, pretrained=True, model_path=str(tmp_path / "snap")))
    t2 = Trainer(cfg2, workdir=str(tmp_path / "b"))
    loaded = jax.device_get(t2.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), trained, loaded)
    t2.close()


def test_resume_restores_trainer_meta(tmp_path):
    """best_val / epochs_done / plateau state survive a restart — without
    them the first post-resume validation clobbers the best snapshot,
    shuffle seeds replay from epoch 0, and a decayed plateau lr jumps
    back up (round-2 review findings)."""
    cfg = load_config("configs/deepio_synth.yaml")
    cfg = _small(cfg, epochs=1, batch_size=8, checkpoint_every_steps=5,
                 log_every=100)
    wd = str(tmp_path / "run")
    t = Trainer(cfg, workdir=wd)
    t.fit(epochs=2)
    best, epochs = t.best_val, t._epochs_done
    assert np.isfinite(best) and epochs == 2
    t.close()

    t2 = Trainer(cfg, workdir=wd, resume=True)
    assert t2.best_val == best
    assert t2._epochs_done == 2
    t2.close()
