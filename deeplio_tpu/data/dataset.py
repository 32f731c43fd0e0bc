"""Window dataset + batch assembly (reference:
``deeplio/datasets/kitti.py::Kitti(Dataset)`` + its custom collate —
SURVEY.md §2.2/§3.4).

Each item is a temporal window of ``sequence-size`` frames from one drive;
the configured ``combinations`` define the P frame pairs. Per pair the item
carries the IMU samples timestamped between the two frames — PADDED to the
static ``max-imu-per-pair`` length with a mask (the reference returns
variable-length lists and a custom collate; XLA needs pad+mask, SURVEY.md
§7 hard-part 2) — and the float64-derived relative pose GT (dx, dq).

Projection does NOT happen here: raw padded scans go to device and are
projected inside the compiled step.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from deeplio_tpu.config.schema import Config, DatasetConfig
from deeplio_tpu.data import np_spatial as nsp
from deeplio_tpu.data.drives import (Drive, KittiRawDrive, PermutedDrive,
                                     SyntheticDrive)


# Keys collated FLAT ([B*S, ...] instead of [B, S, ...]): the train step
# consumes per-frame planes, and a device-side (B, S)->B*S merge is not
# layout-free under TPU tiling (XLA materializes ~0.4 ms reshape copies
# per kernel operand at flagship scale) — the host view reshape is free.
_FLAT_KEYS = ("points_x", "points_y", "points_z", "points_rem",
              "points_valid")


def collate(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-item dicts into a host batch (plane keys flattened)."""
    out = {}
    for k in items[0]:
        v = np.stack([it[k] for it in items])
        if k in _FLAT_KEYS:
            v = v.reshape((-1,) + v.shape[2:])
        out[k] = v
    return out


class WindowDataset:
    def __init__(self, ds_cfg: DatasetConfig, drives: Sequence[Drive],
                 with_points: bool = True, image_cache=None):
        """image_cache: a ``ProjectionCache`` — items then carry
        pre-projected f16 ``images`` [S,H,W,C] instead of raw points and
        the train step skips its projection stage (data/proj_cache.py)."""
        self.cfg = ds_cfg
        self.drives = list(drives)
        self.with_points = with_points and image_cache is None
        self.image_cache = image_cache
        S = ds_cfg.sequence_size
        stride = max(ds_cfg.window_stride, 1)
        self.index: List[Tuple[int, int]] = []
        for di, d in enumerate(self.drives):
            n_windows = max(len(d) - S + 1, 0)
            self.index.extend((di, s) for s in range(0, n_windows, stride))

    def __len__(self) -> int:
        return len(self.index)

    def _pair_meta(self, d, s):
        """(imu, imu_mask, x_gt, q_gt, valid) for one window."""
        combos = self.cfg.effective_combinations
        P = len(combos)
        T = self.cfg.max_imu_per_pair
        imu = np.zeros((P, T, 6), np.float32)
        imu_mask = np.zeros((P, T), np.float32)
        x_gt = np.zeros((P, 3), np.float32)
        q_gt = np.zeros((P, 4), np.float32)
        valid = np.ones((P,), np.float32)
        for pi, (i, j) in enumerate(combos):
            ti, tj = d.frame_time(s + i), d.frame_time(s + j)
            w = d.imu_between(ti, tj)
            k = min(len(w), T)
            if k > 0:
                imu[pi, :k] = w[:k]
                imu_mask[pi, :k] = 1.0
            else:
                valid[pi] = 0.0  # no IMU between frames: degraded pair
            dx, dq = nsp.relative_pose(d.pose(s + i), d.pose(s + j))
            x_gt[pi] = dx.astype(np.float32)
            q_gt[pi] = dq.astype(np.float32)
        return imu, imu_mask, x_gt, q_gt, valid

    def get(self, idx: int) -> Dict[str, np.ndarray]:
        di, s = self.index[idx]
        d = self.drives[di]
        S = self.cfg.sequence_size

        item: Dict[str, np.ndarray] = {}
        if self.with_points:
            # SoA channel planes (train/step.py contract): drives cache
            # the per-scan transpose (points_planes) so window assembly is
            # pure row memcpy — no per-window transpose/ascontiguousarray.
            planes, vld = zip(*[d.points_planes(s + k) for k in range(S)])
            for c, key in enumerate(("points_x", "points_y",
                                     "points_z", "points_rem")):
                item[key] = np.stack([p[c] for p in planes])  # [S, N]
            item["points_valid"] = np.stack(vld)      # [S, N]
        elif self.image_cache is not None:
            item["images"] = np.asarray(
                self.image_cache.images(d, s, s + S))  # [S, H, W, C] f16

        imu, imu_mask, x_gt, q_gt, valid = self._pair_meta(d, s)
        item.update(imu=imu, imu_mask=imu_mask, x_gt=x_gt, q_gt=q_gt, valid=valid)
        item["meta"] = np.asarray([di, s], np.int32)
        return item

    def get_into(self, idx: int, row: int, out: Dict[str, np.ndarray]):
        """Assemble window ``idx`` DIRECTLY into row ``row`` of a
        preallocated batch (the collate copy never happens — on a
        1-core host the batch-assembly copies are the warm-path
        bottleneck; docs/performance.md round-5 input-pipeline section)."""
        di, s = self.index[idx]
        d = self.drives[di]
        S = self.cfg.sequence_size
        keys = ("points_x", "points_y", "points_z", "points_rem")
        for k in range(S):
            planes, vld = d.points_planes(s + k)
            r = row * S + k
            for c, key in enumerate(keys):
                out[key][r] = planes[c]
            out["points_valid"][r] = vld
        (out["imu"][row], out["imu_mask"][row], out["x_gt"][row],
         out["q_gt"][row], out["valid"][row]) = self._pair_meta(d, s)
        out["meta"][row] = (di, s)

    def _alloc_batch(self, local: int) -> Dict[str, np.ndarray]:
        S = self.cfg.sequence_size
        P = len(self.cfg.effective_combinations)
        T = self.cfg.max_imu_per_pair
        N = self.cfg.projection.max_points
        return {
            "points_x": np.empty((local * S, N), np.float32),
            "points_y": np.empty((local * S, N), np.float32),
            "points_z": np.empty((local * S, N), np.float32),
            "points_rem": np.empty((local * S, N), np.float32),
            "points_valid": np.empty((local * S, N), bool),
            "imu": np.empty((local, P, T, 6), np.float32),
            "imu_mask": np.empty((local, P, T), np.float32),
            "x_gt": np.empty((local, P, 3), np.float32),
            "q_gt": np.empty((local, P, 4), np.float32),
            "valid": np.empty((local, P), np.float32),
            "meta": np.empty((local, 2), np.int32),
        }

    def iter_batches(self, batch_size: int, shuffle: bool = True,
                     seed: int = 0, drop_last: bool = True,
                     workers: int = 8,
                     process_index: int = 0, process_count: int = 1,
                     ) -> Iterator[Dict[str, np.ndarray]]:
        """Batch iterator with thread-parallel item assembly.

        The reference hides per-item cost in DataLoader worker PROCESSES;
        here item work is numpy/disk-IO (GIL-releasing), so a thread pool
        suffices and avoids fork/serialization overhead (SURVEY.md §7
        hard-part 3: the host must keep up with the device-side step).

        Multi-host: ``batch_size`` is GLOBAL. Every process derives the
        same shuffled order (same seed), then assembles only its
        contiguous row block of each global batch — process p of n yields
        rows [p*B/n : (p+1)*B/n), matching the mesh's jax.devices() row
        layout (parallel/multihost.py::process_slice).
        """
        from concurrent.futures import ThreadPoolExecutor

        if batch_size % process_count:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"{process_count} processes")
        if process_count > 1 and not drop_last:
            raise ValueError("multi-process iteration requires drop_last "
                             "(a ragged tail batch cannot shard evenly)")
        local = batch_size // process_count
        lo = process_index * local

        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        n = len(order)
        end = (n // batch_size) * batch_size if drop_last else n
        direct = self.with_points  # get_into fast path (no collate copy)

        def assemble(sel):
            if not direct:
                return None
            out = self._alloc_batch(len(sel))
            return out

        if workers <= 1:
            for b0 in range(0, end, batch_size):
                sel = order[b0 + lo:b0 + lo + local]
                out = assemble(sel)
                if out is not None:
                    for row, i in enumerate(sel):
                        self.get_into(int(i), row, out)
                    yield out
                else:
                    yield collate([self.get(int(i)) for i in sel])
            return
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for b0 in range(0, end, batch_size):
                sel = order[b0 + lo:b0 + lo + local]
                out = assemble(sel)
                if out is not None:
                    list(pool.map(
                        lambda ri: self.get_into(int(ri[1]), ri[0], out),
                        enumerate(sel)))
                    yield out
                else:
                    yield collate(list(pool.map(
                        self.get, (int(i) for i in sel))))

    def steps_per_epoch(self, batch_size: int) -> int:
        return len(self) // batch_size


def build_drives(cfg: Config, split: str) -> List[Drive]:
    """Instantiate drives for a split ('train'|'validation'|'test').

    With ``datasets.synthetic: true`` the split maps to deterministic
    synthetic drives (hermetic CI / benches, SURVEY.md §4 item 2).
    """
    ds = cfg.datasets

    halves = getattr(ds.projection, "kernel_aligned", "off") == "halves"
    slot_layout = "halves" if halves else "slots"

    def _layout(drives: List[Drive]) -> List[Drive]:
        # kernel-aligned=halves: slot-binned drives emit the dual-half
        # layout STRAIGHT from the binning pass (slot_layout above — no
        # per-access permutation gather, and the drive's scan cache holds
        # the final layout); a drive without a slot grid gets the explicit
        # PermutedDrive view, so EVERY consumer (window dataset, streaming,
        # projection cache) sees the layout the route expects.
        if not halves:
            return drives
        from deeplio_tpu.ops.projection import halves_permutation

        perm = None
        out = []
        for d in drives:
            if getattr(d, "slot_grid", None) is not None:
                out.append(d)  # binned straight into halves layout
                continue
            if perm is None:
                perm = halves_permutation(ds.projection.max_points,
                                          ds.projection.height,
                                          ds.projection.width)
            out.append(PermutedDrive(d, perm))
        return out

    if ds.synthetic:
        seeds = {
            "train": tuple(range(ds.synthetic_train_drives)),
            "validation": tuple(100 + i
                                for i in range(ds.synthetic_eval_drives)),
            "test": tuple(200 + i for i in range(ds.synthetic_eval_drives)),
        }[split]
        n_frames = ds.synthetic_frames
        if split != "train" and ds.synthetic_eval_frames:
            n_frames = ds.synthetic_eval_frames
        slot_grid = None
        if (getattr(ds, "slot_bin", False)
                or ds.projection.kernel_aligned in ("trust", "halves")):
            # asserted aligned routes need the slot grid BY CONSTRUCTION;
            # synthetic_scan emits compacted (non-grid) ring order.
            slot_grid = (ds.projection.height, ds.projection.width,
                         ds.projection.fov_up_deg,
                         ds.projection.fov_down_deg)
        return _layout([SyntheticDrive(n_frames=n_frames,
                                       max_points=ds.projection.max_points,
                                       seed=sd, world_mode=ds.synthetic_world,
                                       slot_grid=slot_grid,
                                       slot_layout=slot_layout)
                        for sd in seeds])
    split_map = {"train": ds.train, "validation": ds.validation, "test": ds.test}
    slot_grid = None
    if getattr(ds, "slot_bin", False):
        slot_grid = (ds.projection.height, ds.projection.width,
                     ds.projection.fov_up_deg, ds.projection.fov_down_deg)
    drives: List[Drive] = []
    for date, ids in split_map[split].items():
        for drive in ids:
            if isinstance(drive, dict):
                # odometry-sequence entry: {drive, start, end}
                drives.append(KittiRawDrive(
                    ds.root_path, date, int(drive["drive"]),
                    max_points=ds.projection.max_points,
                    start=int(drive.get("start", 0)),
                    end=int(drive.get("end", -1)),
                    slot_grid=slot_grid, slot_layout=slot_layout))
            else:
                drives.append(KittiRawDrive(ds.root_path, date, int(drive),
                                            max_points=ds.projection.max_points,
                                            slot_grid=slot_grid,
                                            slot_layout=slot_layout))
    return _layout(drives)


def build_dataset(cfg: Config, split: str, image_cache=None) -> WindowDataset:
    with_points = cfg.model.arch in ("deeplo", "deeplio")
    return WindowDataset(cfg.datasets, build_drives(cfg, split),
                         with_points=with_points, image_cache=image_cache)
