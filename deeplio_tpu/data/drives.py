"""Drive abstractions: real KITTI raw drives and the synthetic fixture.

Reference: ``deeplio/datasets/kitti.py::KittiRawData`` (SURVEY.md §2.2) —
lazy per-drive access to velodyne scans, OXTS records and timestamps, plus
global-pose computation via the mercator trick. Differences by design:

  * scans are padded/truncated to a STATIC ``max_points`` with a validity
    mask (XLA static shapes);
  * poses are computed in float64 on host and normalised to a drive-local
    origin (f32-safe magnitudes on device);
  * projection does NOT happen here — it runs on device inside the
    compiled step (ops/projection.py).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from deeplio_tpu.data import np_spatial as nsp
from deeplio_tpu.data import synthetic as syn


class Drive:
    """Interface: one continuously-recorded drive."""

    name: str = "drive"

    def __len__(self) -> int:
        raise NotImplementedError

    def points(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """Padded scan i: ([max_points, 4] f32, [max_points] bool)."""
        raise NotImplementedError

    def points_planes(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """Scan i as SoA channel planes: ([4, max_points] f32 contiguous,
        [max_points] bool) — the window dataset's hot-path layout (its
        batch arrays are per-plane, so plane rows memcpy straight in with
        no per-window transpose). Subclasses cache this where points are
        cached."""
        p, v = self.points(i)
        return np.ascontiguousarray(p[:, :4].T), v

    def frame_time(self, i: int) -> float:
        raise NotImplementedError

    def pose(self, i: int) -> np.ndarray:
        """Drive-local global pose of frame i, float64 [4,4]."""
        raise NotImplementedError

    def imu_between(self, t0: float, t1: float) -> np.ndarray:
        """IMU samples [K, 6] = (ax,ay,az,wx,wy,wz) with t0 < t <= t1."""
        raise NotImplementedError


class PermutedDrive(Drive):
    """View of a drive with a fixed per-scan point permutation applied —
    the dual-half slot layout for ``kernel-aligned: halves``
    (ops/projection.py::halves_permutation). Living at the DRIVE level
    means every consumer (window dataset, streaming odometry, projection
    cache) sees the same layout; per-point labels are refused because the
    permutation breaks raw-order alignment."""

    def __init__(self, inner: Drive, perm: np.ndarray):
        self.inner = inner
        self.perm = np.asarray(perm)
        self.name = inner.name

    def __len__(self) -> int:
        return len(self.inner)

    def points(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        p, v = self.inner.points(i)
        return p[self.perm], v[self.perm]

    def points_planes(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        p, v = self.inner.points_planes(i)
        return np.ascontiguousarray(p[:, self.perm]), v[self.perm]

    def labels(self, i: int, labels_path: str):
        raise ValueError("per-point labels are incompatible with the "
                         "halves point layout (points are re-ordered)")

    def frame_time(self, i: int) -> float:
        return self.inner.frame_time(i)

    def pose(self, i: int) -> np.ndarray:
        return self.inner.pose(i)

    def imu_between(self, t0: float, t1: float) -> np.ndarray:
        return self.inner.imu_between(t0, t1)


class KittiRawDrive(Drive):
    """One KITTI raw sync'd drive: ``<root>/<date>/<date>_drive_%04d_sync``.

    Layout (KITTI raw devkit):
      velodyne_points/data/%010d.bin  float32 Nx4 (x,y,z,remission)
      velodyne_points/timestamps.txt
      oxts/data/%010d.txt             30-field GPS/IMU record
      oxts/timestamps.txt
    """

    # 0-based field indices in an OXTS record.
    _LAT, _LON, _ALT, _ROLL, _PITCH, _YAW = 0, 1, 2, 3, 4, 5
    _AX, _AY, _AZ = 11, 12, 13     # body-frame acceleration
    _WX, _WY, _WZ = 17, 18, 19     # body-frame angular rates

    def __init__(self, root: str, date: str, drive: int, max_points: int = 131072,
                 start: int = 0, end: int = -1, slot_grid=None,
                 slot_layout: str = "slots"):
        self.root = root
        self.date = date
        self.drive = drive
        self.max_points = max_points
        # (H, W, fov_up_deg, fov_down_deg) or None: bin scans onto the
        # fixed ring/azimuth grid for the slot-aligned projection route
        # (data/synthetic.py::slot_bin_scan; datasets `slot-bin: true`).
        # slot_layout "halves" bins STRAIGHT into the dual-half layout
        # kernel-aligned=halves consumes — fused into the binning pass, so
        # no separate halves_permutation gather is ever paid per access.
        self.slot_grid = slot_grid
        self.slot_layout = slot_layout
        if slot_grid is not None and max_points % (slot_grid[0] * slot_grid[1]):
            raise ValueError(
                f"slot_grid {slot_grid[:2]} needs max_points ({max_points}) "
                f"to be a multiple of H*W")
        base = os.path.join(root, date, f"{date}_drive_{drive:04d}_sync")
        self.velo_dir = os.path.join(base, "velodyne_points", "data")
        self.oxts_dir = os.path.join(base, "oxts", "data")
        self.name = f"{date}_drive_{drive:04d}"

        self.velo_times = self._read_timestamps(
            os.path.join(base, "velodyne_points", "timestamps.txt"))
        self.oxts_times = self._read_timestamps(
            os.path.join(base, "oxts", "timestamps.txt"))
        n = len(self.velo_times)
        end = n if end < 0 else min(end + 1, n)
        self.start, self.end = start, end

        # OXTS records parse LAZILY on first pose/IMU access: sequence 00
        # alone is ~4,540 tiny files, and splits are often instantiated just
        # for length/metadata (VERDICT r1 weak #6). Parsed once, cached.
        self._oxts: Optional[np.ndarray] = None
        self._poses: Optional[np.ndarray] = None

        # Epoch offset so frame/oxts times share one clock.
        t0 = min(self.velo_times[0], self.oxts_times[0]) if n else 0.0
        self.velo_times = self.velo_times - t0
        self.oxts_times = self.oxts_times - t0

    @property
    def oxts(self) -> np.ndarray:
        if self._oxts is None:
            recs = []
            for i in range(len(self.oxts_times)):
                with open(os.path.join(self.oxts_dir, f"{i:010d}.txt")) as f:
                    recs.append(np.fromstring(f.read(), sep=" "))
            self._oxts = np.stack(recs) if recs else np.zeros((0, 30))
        return self._oxts

    @property
    def _poses_oxts(self) -> np.ndarray:
        if self._poses is None:
            oxts = self.oxts
            # Global poses at OXTS timestamps, drive-local origin.
            scale = (np.cos(np.deg2rad(oxts[0, self._LAT]))
                     if len(oxts) else 1.0)
            Ts = [nsp.oxts_to_pose(
                r[self._LAT], r[self._LON], r[self._ALT],
                r[self._ROLL], r[self._PITCH], r[self._YAW], scale)
                for r in oxts]
            Ts = np.stack(Ts) if Ts else np.zeros((0, 4, 4))
            if len(Ts):
                T0_inv = nsp.se3_inv(Ts[0])
                Ts = np.einsum("ij,njk->nik", T0_inv, Ts)
            self._poses = Ts
        return self._poses

    @staticmethod
    def _read_timestamps(path: str) -> np.ndarray:
        """'2011-10-03 12:55:34.349659964' lines -> float64 epoch seconds."""
        import datetime as dt
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                date_part, time_part = line.split(" ")
                frac = 0.0
                if "." in time_part:
                    time_part, frac_s = time_part.split(".")
                    frac = float("0." + frac_s)
                t = dt.datetime.strptime(date_part + " " + time_part,
                                         "%Y-%m-%d %H:%M:%S")
                out.append(t.timestamp() + frac)
        return np.asarray(out, np.float64)

    def __len__(self) -> int:
        return self.end - self.start

    def points(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        raw = np.fromfile(
            os.path.join(self.velo_dir, f"{self.start + i:010d}.bin"),
            dtype=np.float32).reshape(-1, 4)
        if self.slot_grid is not None:
            from deeplio_tpu.data.synthetic import slot_bin_scan

            H, W, fu, fd = self.slot_grid
            return slot_bin_scan(raw, np.ones(raw.shape[0], bool), H, W,
                                 self.max_points // (H * W), fu, fd,
                                 layout=self.slot_layout)
        n = min(raw.shape[0], self.max_points)
        pts = np.zeros((self.max_points, 4), np.float32)
        pts[:n] = raw[:n]
        valid = np.zeros(self.max_points, bool)
        valid[:n] = True
        return pts, valid

    def labels(self, i: int, labels_path: str) -> Optional[np.ndarray]:
        """SemanticKITTI-format per-point labels for frame i, aligned with
        :meth:`points` padding (0 = unlabeled past the valid points).

        Layout: ``<labels_path>/<drive-name>/<frame>.label`` — one uint32
        per point, low 16 bits semantic id, high 16 instance id (the
        SemanticKITTI file contract). Returns None when the file is absent
        (caller falls back to pseudo-labels).
        """
        if self.slot_grid is not None:
            # slot binning permutes/drops points; per-point label files
            # index the RAW order and would silently misalign.
            raise ValueError(
                "per-point labels are incompatible with slot-bin "
                "(points are re-ordered onto the slot grid)")
        path = os.path.join(labels_path, self.name,
                            f"{self.start + i:010d}.label")
        if not os.path.exists(path):
            return None
        raw = np.fromfile(path, dtype=np.uint32) & 0xFFFF
        n = min(raw.shape[0], self.max_points)
        out = np.zeros(self.max_points, np.int32)
        out[:n] = raw[:n].astype(np.int32)
        return out

    def frame_time(self, i: int) -> float:
        return float(self.velo_times[self.start + i])

    def pose(self, i: int) -> np.ndarray:
        """Pose at the velodyne timestamp: nearest OXTS record's pose.

        (KITTI sync'd drives have 1:1 frame<->oxts alignment; fall back to
        nearest for robustness.)
        """
        t = self.velo_times[self.start + i]
        j = int(np.clip(np.searchsorted(self.oxts_times, t), 0,
                        len(self.oxts_times) - 1))
        if j > 0 and abs(self.oxts_times[j - 1] - t) < abs(self.oxts_times[j] - t):
            j -= 1
        return self._poses_oxts[j]

    def imu_between(self, t0: float, t1: float) -> np.ndarray:
        sel = (self.oxts_times > t0) & (self.oxts_times <= t1)
        r = self.oxts[sel]
        if r.size == 0:
            return np.zeros((0, 6), np.float32)
        return np.stack(
            [r[:, self._AX], r[:, self._AY], r[:, self._AZ],
             r[:, self._WX], r[:, self._WY], r[:, self._WZ]], -1
        ).astype(np.float32)


class SyntheticDrive(Drive):
    """Fabricated drive with self-consistent geometry (data/synthetic.py).

    Exposes exactly the KittiRawDrive interface so the window dataset and
    all downstream code are oblivious to the source.
    """

    def __init__(self, n_frames: int = 64, max_points: int = 16384,
                 seed: int = 0, world_points: int = 30000, name: str = "synth",
                 world_mode: str = "origin", slot_grid=None,
                 slot_layout: str = "slots"):
        self.max_points = max_points
        self.seed = seed
        self.slot_layout = slot_layout
        # (H, W, fov_up_deg, fov_down_deg) or None — synthetic_scan emits
        # COMPACTED ring-ordered scans (not a slot grid!), so asserted
        # aligned routes (kernel-aligned trust/halves) need the same
        # binning as real drives (build_drives sets this automatically).
        self.slot_grid = slot_grid
        if slot_grid is not None and max_points % (slot_grid[0] * slot_grid[1]):
            raise ValueError(
                f"slot_grid {slot_grid[:2]} needs max_points ({max_points}) "
                f"to be a multiple of H*W")
        self.name = f"{name}_{seed}"
        self._Ts, self._times = syn.synthetic_trajectory(n_frames, seed=seed)
        if world_mode == "origin":
            self._world = syn.synthetic_world(world_points, seed=seed)
        elif world_mode == "corridor":
            # trajectory-following world: long drives stay populated
            # (synthetic.py::synthetic_world_corridor rationale)
            self._world = syn.synthetic_world_corridor(self._Ts, seed=seed)
        else:
            raise ValueError(
                f"unknown synthetic world mode {world_mode!r} "
                "(expected 'origin' or 'corridor')")
        self._oxts = syn.synthetic_oxts(self._Ts, self._times, seed=seed)
        # Loader-equivalent poses: recompute from the OXTS records through
        # the same mercator path as the real loader (drive-local origin).
        scale = np.cos(np.deg2rad(self._oxts.lat[0]))
        Ts = np.stack([
            nsp.oxts_to_pose(self._oxts.lat[k], self._oxts.lon[k],
                             self._oxts.alt[k], self._oxts.roll[k],
                             self._oxts.pitch[k], self._oxts.yaw[k], scale)
            for k in range(len(self._oxts.times))
        ])
        T0_inv = nsp.se3_inv(Ts[0])
        self._poses_oxts = np.einsum("ij,njk->nik", T0_inv, Ts)

    def __len__(self) -> int:
        return len(self._times)

    @lru_cache(maxsize=None)
    def _scan(self, i: int):
        pts, valid = syn.synthetic_scan(self._world, self._Ts[i],
                                        self.max_points,
                                        seed=self.seed * 1000 + i)
        if self.slot_grid is not None:
            H, W, fu, fd = self.slot_grid
            return syn.slot_bin_scan(pts, valid, H, W,
                                     self.max_points // (H * W), fu, fd,
                                     layout=self.slot_layout)
        return pts, valid

    def points(self, i: int):
        return self._scan(i)

    @lru_cache(maxsize=None)
    def points_planes(self, i: int):
        pts, valid = self._scan(i)
        return np.ascontiguousarray(pts[:, :4].T), valid

    def labels(self, i: int, labels_path: str):
        """Interface parity with KittiRawDrive: slot binning re-orders
        points, so per-point label files are refused; otherwise None
        (synthetic drives have no label files — pseudo-label path)."""
        if self.slot_grid is not None:
            raise ValueError(
                "per-point labels are incompatible with slot-bin "
                "(points are re-ordered onto the slot grid)")
        return None

    def frame_time(self, i: int) -> float:
        return float(self._times[i])

    def pose(self, i: int) -> np.ndarray:
        t = self._times[i]
        j = int(np.clip(np.round(t * syn.IMU_HZ), 0, len(self._poses_oxts) - 1))
        return self._poses_oxts[j]

    def imu_between(self, t0: float, t1: float) -> np.ndarray:
        sel = (self._oxts.times > t0) & (self._oxts.times <= t1)
        if not sel.any():
            return np.zeros((0, 6), np.float32)
        return np.concatenate(
            [self._oxts.acc[sel], self._oxts.gyro[sel]], -1).astype(np.float32)
