"""Epoch-level projection cache (docs/performance.md roadmap item 3).

Projection is deterministic per frame, yet the reference re-projects every
frame every epoch in its DataLoader workers (SURVEY.md §3.4) and our
compiled step re-projects on device. For REAL training runs (many epochs
over the same drives) a one-time device-side prefill pass stores each
frame's projected image once; later epochs stream images straight from an
on-disk f16 memmap and the train step skips its projection stage.

Excluded from bench.py by protocol — the bench measures the full
projection+fwd+bwd pipeline.

Cache layout: ``<dir>/<drive-name>-<fingerprint>.npy`` holding
[n_frames, H, W, C] float16, where the fingerprint hashes every input
that affects projected values (geometry, backend, channels, norm).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Sequence

import jax
import numpy as np

from deeplio_tpu.config.schema import DatasetConfig
from deeplio_tpu.utils import get_app_logger


def fingerprint(ds_cfg: DatasetConfig) -> str:
    p = ds_cfg.projection
    blob = json.dumps({
        "h": p.height, "w": p.width, "fu": p.fov_up_deg, "fd": p.fov_down_deg,
        "n": p.max_points, "backend": p.backend, "packed": p.packed,
        "channels": list(ds_cfg.channels),
        "mean": list(ds_cfg.mean), "std": list(ds_cfg.std),
    }, sort_keys=True)
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


class ProjectionCache:
    """Builds and serves per-drive projected-image memmaps."""

    def __init__(self, directory: str, ds_cfg: DatasetConfig):
        self.dir = os.path.abspath(directory)
        self.ds_cfg = ds_cfg
        self.tag = fingerprint(ds_cfg)
        os.makedirs(self.dir, exist_ok=True)
        self._maps = {}

    def _path(self, drive) -> str:
        # start/len disambiguate sub-ranged drives sharing one raw name
        # (e.g. odometry seq 08 = a 1100+ slice of 2011_09_30 drive 28).
        span = f"{getattr(drive, 'start', 0)}-{len(drive)}"
        return os.path.join(self.dir, f"{drive.name}@{span}-{self.tag}.npy")

    def _heartbeat(self) -> str:
        # One heartbeat per (cache dir, fingerprint): the primary touches it
        # after every projected chunk so waiting processes can tell a slow
        # build from a dead primary (VERDICT r2 weak #6).
        return os.path.join(self.dir, f"building-{self.tag}.hb")

    def ensure(self, drives: Sequence, batch: int = 16,
               timeout_s: float = 3600.0, stall_s: float = 120.0) -> None:
        """Prefill: project every frame of every drive once (device).

        Multi-host: only the PRIMARY process builds (the workdir is shared
        — orbax checkpointing already requires that); the others poll for
        the finished files. Per-process tmp names keep even a misconfigured
        non-shared-fs launch from corrupting a neighbour's build.

        Liveness: the primary touches a heartbeat file per chunk; a waiting
        process raises after ``stall_s`` without either a fresh heartbeat or
        the finished file, instead of blocking for the full ``timeout_s``
        when the primary died mid-build.
        """
        import time

        from deeplio_tpu.ops.projection import make_projector

        log = get_app_logger()
        todo = [d for d in drives if not os.path.exists(self._path(d))]
        if not todo:
            return
        if jax.process_index() != 0:
            deadline = time.time() + timeout_s
            last_alive = time.time()  # grace window before the hb appears
            for d in todo:
                while not os.path.exists(self._path(d)):
                    try:
                        last_alive = max(last_alive,
                                         os.path.getmtime(self._heartbeat()))
                    except OSError:
                        pass
                    now = time.time()
                    if now - last_alive > stall_s:
                        raise RuntimeError(
                            f"projection cache {self._path(d)}: the primary "
                            f"process's build heartbeat went stale "
                            f"({now - last_alive:.0f}s > {stall_s:.0f}s) — "
                            "primary likely died mid-build")
                    if now > deadline:
                        raise TimeoutError(
                            f"projection cache {self._path(d)} not built by "
                            "the primary process within the timeout")
                    time.sleep(2.0)
            return
        ds = self.ds_cfg
        projector = jax.jit(make_projector(ds.projection, ds.channels,
                                           ds.mean, ds.std))

        def beat():
            with open(self._heartbeat(), "w") as f:
                f.write(str(os.getpid()))

        # Beat from a daemon thread, not per chunk: the first projector()
        # call can block for minutes inside a remote jit compile, and a
        # chunk-paced heartbeat would go stale mid-compile, false-killing
        # healthy waiters. The thread dies with the process, which is
        # exactly the liveness signal waiters need.
        import threading
        stop = threading.Event()

        def _beater():
            while not stop.is_set():
                beat()
                stop.wait(15.0)

        threading.Thread(target=_beater, daemon=True).start()
        try:
            for d in todo:
                n = len(d)
                H, W = ds.projection.height, ds.projection.width
                C = ds.num_image_channels
                tmp = f"{self._path(d)}.tmp.{os.getpid()}"
                out = np.lib.format.open_memmap(
                    tmp, mode="w+", dtype=np.float16, shape=(n, H, W, C))
                for b0 in range(0, n, batch):
                    sel = range(b0, min(b0 + batch, n))
                    pts, vld = zip(*[d.points(i) for i in sel])
                    # Static batch shape: pad the tail chunk to `batch` frames
                    # so the jit doesn't recompile per remainder size.
                    pad = batch - len(pts)
                    pts = np.stack(list(pts) + [pts[-1]] * pad)
                    vld = np.stack(list(vld) + [vld[-1]] * pad)
                    img, _ = projector(pts, vld)
                    out[b0:b0 + len(sel)] = np.asarray(
                        jax.device_get(img[:len(sel)]), np.float16)
                out.flush()
                del out
                os.replace(tmp, self._path(d))
                log.info("projection cache: %s (%d frames) -> %s",
                         d.name, n, self._path(d))
        finally:
            stop.set()
            try:
                os.remove(self._heartbeat())
            except OSError:
                pass

    def images(self, drive, lo: int, hi: int) -> np.ndarray:
        """[hi-lo, H, W, C] float16 view for frames [lo, hi)."""
        path = self._path(drive)
        mm = self._maps.get(path)
        if mm is None:
            mm = np.load(path, mmap_mode="r")
            self._maps[path] = mm
        return mm[lo:hi]
