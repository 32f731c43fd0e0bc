"""Orbax checkpointing (reference: ``torch.save``/``torch.load`` of
``{epoch, state_dict, optimizer, best}`` + ``--resume`` + pretrained
PointSeg subtree loading — SURVEY.md §5 checkpoint/resume row).

Capabilities, matching and exceeding the reference:
  * periodic save of the full TrainState (params incl. LWS loss scalars,
    optimizer state, step, PRNG key, BatchNorm stats)
  * resume-from-latest on restart (auto-recovery story)
  * best-model tracking via metrics
  * restore of only the PointSeg encoder subtree from a segmentation
    pretraining checkpoint (the reference's pretrained-backbone hook)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from deeplio_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 save_every_steps: int = 500):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every_steps = save_every_steps
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )

    def maybe_save(self, state: TrainState, metrics: Optional[dict] = None,
                   force: bool = False, step: Optional[int] = None) -> bool:
        if step is None:
            step = int(jax.device_get(state.step))
        if not force and (self.save_every_steps <= 0
                          or step % self.save_every_steps != 0):
            return False
        exists = step in (self._mgr.all_steps() or []) or \
            step == getattr(self, "_last_dispatched", None)
        if exists:
            # A periodic/best save already wrote (or is still async-writing)
            # this step — orbax raises StepAlreadyExistsError on a
            # duplicate, and all_steps() only sees FINALIZED step dirs.
            # Exception: a FORCED save carrying metrics must not be lost to
            # a metrics-less periodic dispatch at the same step (the orbax
            # manager's best-tracking would never see that validation) —
            # wait for the in-flight write and overwrite it.
            if not (force and metrics
                    and not getattr(self, "_dispatched_metrics", {}).get(step)):
                return False
            self.wait()
            if step in (self._mgr.all_steps() or []):
                # Overwrite = delete + save, which opens a crash window
                # with NO checkpoint at this step (orbax coordinates the
                # delete across processes itself — all processes call it,
                # like save). Bounded risk when an older step remains to
                # resume from; if this is the ONLY finalized checkpoint,
                # keep the metrics-less save instead of risking losing
                # the run's sole restore point.
                if len(self._mgr.all_steps()) <= 1:
                    return False
                self._mgr.delete(step)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(jax.device_get(state)),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._last_dispatched = step
        if not hasattr(self, "_dispatched_metrics"):
            self._dispatched_metrics = {}
        self._dispatched_metrics[step] = bool(metrics)
        return True

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None
                ) -> TrainState:
        """Restore into the structure of ``state_like`` (shapes/dtypes)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = jax.device_get(state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params(directory: str, params: Any, overwrite: bool = False):
    """One-shot parameter snapshot (e.g. a pretrained PointSeg encoder or
    the running best model)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(directory), "params"),
               jax.device_get(params), force=overwrite)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(directory: str, params_like: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.join(os.path.abspath(directory), "params"),
                        target=jax.device_get(params_like))
    ckptr.close()
    return out


def load_pointseg_backbone(params: Any, pretrained_dir: str) -> Any:
    """Graft a pretrained PointSeg ENCODER into a lidar-feat param tree.

    Mirrors the reference's partial ``state_dict`` load for the PointSeg
    backbone: only ``lidar_feat/pointseg/encoder`` is replaced; everything
    else (including a decoder, when ``part: encoder+decoder``) keeps its
    fresh initialisation — the pretraining snapshot holds the encoder only.
    """
    sub = params["lidar_feat"]["pointseg"]
    loaded = load_params(pretrained_dir, {"encoder": sub["encoder"]})
    new = dict(params)
    lf = dict(new["lidar_feat"])
    ps = dict(lf["pointseg"])
    ps["encoder"] = loaded["encoder"]
    lf["pointseg"] = ps
    new["lidar_feat"] = lf
    return new
