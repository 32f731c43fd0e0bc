"""Training loop / Trainer (reference: the Trainer/Worker classes around
``train.py`` — SURVEY.md §2.5): dataset -> prefetch -> compiled shard_map
step, with metrics, validation, checkpointing and resume.

Observability (SURVEY.md §5): structured JSONL metrics with the reference's
scalar names (loss, loss_x, loss_q, lr...) + stdout logging via the app
logger; TensorBoard is optional (written if tensorboardX/tensorflow is
importable, silently skipped otherwise — the metrics file is the source of
truth).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax

from deeplio_tpu.config.schema import Config
from deeplio_tpu.data.dataset import build_dataset
from deeplio_tpu.data.pipeline import DevicePrefetcher
from deeplio_tpu.losses import init_loss_params
from deeplio_tpu.models import init_model
from deeplio_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from deeplio_tpu.train.checkpoint import CheckpointManager, load_pointseg_backbone
from deeplio_tpu.train.optim import PlateauController, make_optimizer
from deeplio_tpu.train.state import create_train_state
from deeplio_tpu.train.step import build_train_step
from deeplio_tpu.utils import AverageMeter, get_app_logger


class MetricsWriter:
    """JSONL metrics (source of truth) + optional TensorBoard mirror.

    TensorBoard uses the same scalar names as the reference's
    SummaryWriter stream (loss, loss_x, loss_q, ... under train/ and val/)
    for diffability — SURVEY.md §5 observability row. The TB sink is
    import-gated (torch's SummaryWriter when available)."""

    def __init__(self, path: str, tensorboard: bool = True):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    log_dir=os.path.join(os.path.dirname(os.path.abspath(path)),
                                         "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, split: str, metrics: Dict[str, float]):
        rec = {"step": step, "split": split, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{split}/{k}", float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class _NullMetrics:
    """Metrics sink for non-primary processes (multi-host)."""

    def write(self, *a, **k):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(self, cfg: Config, workdir: str = "runs/default",
                 mesh=None, resume: bool = False, eval_only: bool = False):
        """eval_only=True skips the training-split requirement so the
        evaluation CLIs can bootstrap model/state/mesh from a config whose
        datasets block only lists test drives."""
        self.cfg = cfg
        self.workdir = workdir
        self.log = get_app_logger()
        # Multi-host: mesh spans GLOBAL devices; this process feeds only its
        # addressable rows (parallel/multihost.py). Side effects (metrics,
        # checkpoints, best-model snapshots) happen on the primary only —
        # state is fully replicated, so process 0's view is the global one.
        self.proc_index = jax.process_index()
        self.proc_count = jax.process_count()
        self.primary = self.proc_index == 0
        self.mesh = mesh if mesh is not None else make_mesh(
            data=cfg.train.data_parallel)
        n_data = self.mesh.shape["data"]
        if cfg.train.batch_size % n_data:
            raise ValueError(
                f"batch-size {cfg.train.batch_size} not divisible by "
                f"data-parallel size {n_data}")

        image_cache = None
        if (cfg.train.cache_projections and not eval_only
                and cfg.model.arch in ("deeplo", "deeplio")):
            from deeplio_tpu.data.dataset import build_drives
            from deeplio_tpu.data.proj_cache import ProjectionCache
            image_cache = ProjectionCache(
                os.path.join(workdir, "proj_cache"), cfg.datasets)
            drives = build_drives(cfg, "train")
            try:
                drives += build_drives(cfg, "validation")
            except (KeyError, FileNotFoundError):
                pass
            image_cache.ensure(drives)

        self.train_ds = None if eval_only else build_dataset(
            cfg, "train", image_cache=image_cache)
        try:
            self.val_ds = build_dataset(cfg, "validation",
                                        image_cache=image_cache)
        except (KeyError, FileNotFoundError):
            self.val_ds = None
        if not eval_only and len(self.train_ds) == 0:
            raise ValueError("empty training dataset")

        steps_per_epoch = max(
            self.train_ds.steps_per_epoch(cfg.train.batch_size), 1
        ) if self.train_ds is not None else 1000
        self.tx = make_optimizer(cfg.optim, steps_per_epoch)
        self.model, variables = init_model(
            cfg, jax.random.PRNGKey(cfg.train.seed), batch_size=2,
            axis_name="data")
        params = variables["params"]
        if cfg.model.lidar is not None and cfg.model.lidar.pretrained \
                and cfg.model.lidar.model_path:
            params = load_pointseg_backbone(params, cfg.model.lidar.model_path)
            self.log.info("loaded pretrained PointSeg backbone from %s",
                          cfg.model.lidar.model_path)
        if cfg.model.pretrained and cfg.model.model_path:
            # Whole-model warm start (reference: arch-level `model-path`).
            from deeplio_tpu.train.checkpoint import load_params
            params = load_params(cfg.model.model_path, params)
            self.log.info("loaded pretrained model from %s",
                          cfg.model.model_path)
        variables = dict(variables, params=params)

        state = create_train_state(
            variables, init_loss_params(cfg.loss), self.tx,
            jax.random.PRNGKey(cfg.train.seed + 1),
            flat=cfg.optim.flat_update)
        self.state = replicate(self.mesh, state)

        self.spc = max(int(cfg.train.steps_per_call), 1)
        if self.train_ds is not None and self.spc > steps_per_epoch:
            # Epoch tails shorter than the group are documented as
            # dropped; a group larger than the whole epoch would silently
            # train ZERO steps per epoch (rc=0, untrained checkpoint).
            raise ValueError(
                f"steps-per-call {self.spc} exceeds the {steps_per_epoch} "
                f"steps per epoch (batch-size {cfg.train.batch_size}, "
                f"{len(self.train_ds)} windows) — every epoch would drop "
                f"all its batches")
        self.train_step, self.eval_step = build_train_step(
            cfg, self.model, self.tx, self.mesh, steps_per_call=self.spc)

        # Device-resident dataset (data/device_bank.py): pay the transfer
        # once, gather batches on device — bit-equal batches, link-free
        # steady state. Gated on single-process raw-point training.
        self._train_bank = self._val_bank = None
        if cfg.train.device_dataset and not eval_only:
            from deeplio_tpu.data import device_bank as dbank
            if self.proc_count > 1:
                raise ValueError("device-dataset is single-process only")
            if not self.train_ds.with_points:
                raise ValueError(
                    "device-dataset needs raw-point training (arch "
                    "deeplo/deeplio, no cache-projections)")
            nbytes = dbank.bank_nbytes(self.train_ds) + (
                dbank.bank_nbytes(self.val_ds) if self.val_ds else 0)
            self.log.info("staging device-resident dataset (%.0f MB)",
                          nbytes / 1e6)
            self._train_bank = dbank.put_bank(
                dbank.build_host_bank(self.train_ds), self.mesh)
            if self.val_ds is not None and len(self.val_ds):
                self._val_bank = dbank.put_bank(
                    dbank.build_host_bank(self.val_ds), self.mesh)
            self._bank_train_step, self._bank_eval_step = \
                dbank.make_bank_steps(self.train_step, self.eval_step)

        self.ckpt = CheckpointManager(
            os.path.join(workdir, cfg.train.checkpoint_dir),
            keep=cfg.train.keep_checkpoints,
            save_every_steps=cfg.train.checkpoint_every_steps)
        self._meta_path = os.path.join(workdir, "trainer_meta.json")
        resumed = False
        if resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                restored = self.ckpt.restore(self.state)
                self.state = replicate(self.mesh, restored)
                self.log.info("resumed from step %d", latest)
                resumed = True

        self.metrics = (MetricsWriter(os.path.join(workdir, "metrics.jsonl"))
                        if self.primary else _NullMetrics())
        self.plateau = PlateauController(cfg.optim)
        self.best_val = float("inf")
        # Host-side mirrors: device_get of state.step every iteration would
        # force a per-step host sync and defeat async dispatch.
        self._host_step = self.step
        self._save_boundary = self._host_step  # periodic-save watermark
        self._epochs_done = 0
        if resumed:
            # Restore host-side trainer state too — otherwise the best-model
            # snapshot gets clobbered by the first (worse) post-resume val,
            # shuffle seeds replay from epoch 0, and the plateau controller
            # forgets its decayed lr (and would RAISE the lr on the next
            # plateau event).
            try:
                with open(self._meta_path) as f:
                    meta = json.load(f)
                self.best_val = float(meta.get("best_val", self.best_val))
                self._epochs_done = int(meta.get("epochs_done", 0))
                self.plateau.restore_state(meta.get("plateau"))
            except FileNotFoundError:
                pass

    @property
    def step(self) -> int:
        return int(jax.device_get(self.state.step))

    def fit(self, epochs: Optional[int] = None):
        if self.train_ds is None:
            raise RuntimeError("Trainer was built with eval_only=True")
        cfg = self.cfg
        epochs = cfg.train.epochs if epochs is None else epochs
        bs = cfg.train.batch_size
        meter = AverageMeter("loss")
        pair_meter = AverageMeter("pairs/s")
        # Epoch numbering continues across fit() calls so shuffle seeds are
        # consumed exactly once each (e.g. --profile-steps splits fitting).
        first_epoch = self._epochs_done
        for epoch in range(first_epoch, first_epoch + epochs):
            if self._train_bank is not None:
                # Device-resident feed: same shuffle order as iter_batches
                # (epoch_indices mirrors its rng), one [bs] int32 vector
                # shipped per step instead of the scans.
                from deeplio_tpu.data.device_bank import epoch_indices
                sh = batch_sharding(self.mesh)
                it = (jax.device_put(w, sh) for w in epoch_indices(
                    len(self.train_ds), bs, shuffle=True,
                    seed=cfg.train.seed + epoch))
                bank = self._train_bank
                call = lambda state, *ws: self._bank_train_step(  # noqa: E731
                    state, bank, *ws)
            else:
                it = DevicePrefetcher(
                    self.train_ds.iter_batches(bs, shuffle=True,
                                               seed=cfg.train.seed + epoch,
                                               process_index=self.proc_index,
                                               process_count=self.proc_count),
                    self.mesh, depth=cfg.train.prefetch,
                    global_batch_size=bs)
                call = self.train_step
            t_last = time.time()

            def _after(m, epoch=epoch):
                nonlocal t_last
                self._host_step += 1
                step = self._host_step
                if step % cfg.train.log_every == 0:
                    m_host = {k: float(jax.device_get(v)) for k, v in m.items()}
                    now = time.time()
                    pairs = bs * cfg.datasets.num_pairs * cfg.train.log_every
                    pair_meter.update(pairs / max(now - t_last, 1e-9))
                    t_last = now
                    meter.update(m_host["loss"])
                    m_host["pairs_per_sec"] = pair_meter.val
                    self.metrics.write(step, "train", m_host)
                    self.log.info(
                        "epoch %d step %d loss %.4f (x %.4f q %.5f) %.0f pairs/s",
                        epoch, step, m_host["loss"], m_host["loss_x"],
                        m_host["loss_q"], pair_meter.val)
            def _periodic_save():
                # Called only where self.state and self._host_step agree
                # (never mid-group with steps-per-call>1): an orbax step
                # label must name the state it contains. Boundary-crossing
                # check instead of `step % every == 0` so a save boundary
                # that falls strictly inside a k-step group still triggers
                # a save at the group end (labeled with the group-end step)
                # rather than being skipped or mislabeled.
                every = self.ckpt.save_every_steps
                step = self._host_step
                if every > 0 and step // every > self._save_boundary // every:
                    self._save_boundary = step
                    # Orbax coordinates multi-process saves itself (primary
                    # writes, everyone barriers) — ALL processes call save.
                    self.ckpt.maybe_save(self.state, force=True, step=step)

            if self.spc == 1:
                for batch in it:
                    self.state, m = call(self.state, batch)
                    _after(m)
                    _periodic_save()
            else:
                # k batches per compiled call; the epoch tail shorter than
                # k is dropped (documented in TrainConfig.steps_per_call —
                # compiling a second remainder program would double the
                # multi-minute flagship compile for <k samples/epoch).
                group = []
                for batch in it:
                    group.append(batch)
                    if len(group) == self.spc:
                        self.state, ms = call(self.state, *group)
                        group.clear()
                        for m in ms:
                            _after(m)
                        _periodic_save()
            if self.val_ds is not None and len(self.val_ds) and \
                    (epoch + 1) % cfg.train.eval_every_epochs == 0:
                val = self.validate()
                if not val:
                    # Validation split smaller than one global batch.
                    self.log.warning(
                        "validation split too small for batch size %d; skipped",
                        cfg.train.batch_size)
                else:
                    self.metrics.write(self._host_step, "val", val)
                    self.log.info("epoch %d val loss %.4f", epoch, val["loss"])
                    if self.plateau.enabled:
                        old_lr = self.plateau.lr
                        new_opt = self.plateau.observe(val["loss"],
                                                       self.state.opt_state)
                        if self.plateau.lr != old_lr:
                            self.state = self.state.replace(opt_state=new_opt)
                            self.log.info("plateau: lr %.2e -> %.2e",
                                          old_lr, self.plateau.lr)
                    # val metrics are psum-identical across processes,
                    # so this branch decides the same way on every host.
                    if val["loss"] < self.best_val:
                        self.best_val = val["loss"]
                        # Dedicated best-model snapshot: the step-indexed
                        # manager only keeps the last N steps, which would
                        # garbage-collect an older best checkpoint.
                        from deeplio_tpu.train.checkpoint import save_params
                        save_params(os.path.join(self.workdir, "best"),
                                    self.state.params, overwrite=True)
                        self.ckpt.maybe_save(self.state, metrics=val,
                                             force=True, step=self._host_step)
                    self._write_meta()
            self._epochs_done = epoch + 1
            self._write_meta()
        self.ckpt.maybe_save(self.state, force=True, step=self._host_step)
        self.ckpt.wait()
        return self.state

    def _write_meta(self):
        if not self.primary:
            return
        tmp = self._meta_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"best_val": self.best_val,
                       "epochs_done": self._epochs_done,
                       "plateau": self.plateau.state_dict()}, f)
        os.replace(tmp, self._meta_path)

    def validate(self) -> Dict[str, float]:
        cfg = self.cfg
        sums: Dict[str, float] = {}
        n = 0
        if self._val_bank is not None:
            from deeplio_tpu.data.device_bank import epoch_indices
            sh = batch_sharding(self.mesh)
            it = (jax.device_put(w, sh) for w in epoch_indices(
                len(self.val_ds), cfg.train.batch_size, shuffle=False))
            bank = self._val_bank
            eval_call = lambda state, w: self._bank_eval_step(  # noqa: E731
                state, bank, w)
        else:
            it = DevicePrefetcher(
                self.val_ds.iter_batches(cfg.train.batch_size, shuffle=False,
                                         process_index=self.proc_index,
                                         process_count=self.proc_count),
                self.mesh, depth=cfg.train.prefetch,
                global_batch_size=cfg.train.batch_size)
            eval_call = self.eval_step
        for batch in it:
            _, _, m = eval_call(self.state, batch)
            m = {k: float(jax.device_get(v)) for k, v in m.items()}
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    def close(self):
        self.ckpt.wait()
        self.ckpt.close()
        self.metrics.close()
