"""KittiRawDrive reader test against a synthesized on-disk KITTI raw tree
(exact devkit layout: velodyne .bin, 30-field OXTS records, timestamp
files) — validates the real-data path without real data (SURVEY.md §2.2)."""

import os

import numpy as np
import pytest

from deeplio_tpu.data import np_spatial as nsp
from deeplio_tpu.data.drives import KittiRawDrive

DATE = "2011_10_03"
DRIVE = 27
N_FRAMES = 6
LAT0, LON0, ALT0 = 48.9843445, 8.4295857, 116.43


def _write_timestamps(path, times):
    import datetime as dt
    base = dt.datetime(2011, 10, 3, 12, 55, 34)
    with open(path, "w") as f:
        for t in times:
            stamp = base + dt.timedelta(seconds=float(t))
            ns = int((t % 1) * 1e9) % 1000
            f.write(stamp.strftime("%Y-%m-%d %H:%M:%S.%f") + f"{ns:03d}\n")


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_raw")
    base = root / DATE / f"{DATE}_drive_{DRIVE:04d}_sync"
    velo = base / "velodyne_points"
    oxts = base / "oxts"
    (velo / "data").mkdir(parents=True)
    (oxts / "data").mkdir(parents=True)

    rng = np.random.default_rng(0)
    frame_times = np.arange(N_FRAMES) * 0.1037
    _write_timestamps(velo / "timestamps.txt", frame_times)
    for i in range(N_FRAMES):
        n = int(rng.integers(5000, 8000))
        pts = np.zeros((n, 4), np.float32)
        rr = rng.uniform(2, 60, n)
        yaw = rng.uniform(-np.pi, np.pi, n)
        pts[:, 0] = rr * np.cos(yaw)
        pts[:, 1] = rr * np.sin(yaw)
        pts[:, 2] = rng.uniform(-1.8, 1.0, n)
        pts[:, 3] = rng.uniform(0, 1, n)
        pts.tofile(velo / "data" / f"{i:010d}.bin")

    # 100 Hz OXTS over the same span, vehicle driving north-east.
    m = int(frame_times[-1] * 100) + 1
    oxts_times = np.arange(m) / 100.0
    _write_timestamps(oxts / "timestamps.txt", oxts_times)
    scale = np.cos(np.deg2rad(LAT0))
    er = nsp.EARTH_RADIUS
    for k, t in enumerate(oxts_times):
        x = 5.0 * t          # m east
        y = 2.0 * t          # m north
        lon = LON0 + np.rad2deg(x / (scale * er))
        lat = np.rad2deg(
            2 * np.arctan(np.exp((y + er * scale * np.log(
                np.tan(np.deg2rad(90 + LAT0) / 2))) / (er * scale))) - np.pi / 2)
        rec = np.zeros(30)
        rec[0], rec[1], rec[2] = lat, lon, ALT0 + 0.01 * t
        rec[5] = 0.38         # yaw
        rec[11:14] = [0.5, 0.01, 9.81]   # ax ay az
        rec[17:20] = [0.001, 0.002, 0.05]  # wx wy wz
        np.savetxt(oxts / "data" / f"{k:010d}.txt", rec[None], fmt="%.9f")
    return str(root)


def test_reader_basic(kitti_root):
    d = KittiRawDrive(kitti_root, DATE, DRIVE, max_points=8192)
    assert len(d) == N_FRAMES
    pts, valid = d.points(0)
    assert pts.shape == (8192, 4) and valid.shape == (8192,)
    assert 5000 <= valid.sum() <= 8000
    assert np.abs(pts[valid][:, :2]).max() < 80


def test_reader_truncates_oversized_scans(kitti_root):
    d = KittiRawDrive(kitti_root, DATE, DRIVE, max_points=1024)
    pts, valid = d.points(1)
    assert valid.sum() == 1024


def test_poses_drive_local_and_motion(kitti_root):
    d = KittiRawDrive(kitti_root, DATE, DRIVE, max_points=2048)
    T0 = d.pose(0)
    np.testing.assert_allclose(T0, np.eye(4), atol=1e-9)
    # ~ (5, 2) m/s over ~0.52 s between frames 0 and 5.
    T5 = d.pose(5)
    dt = d.frame_time(5) - d.frame_time(0)
    v = T5[:2, 3] / dt
    # Positions are in the frame-0 body frame (yaw 0.38 applied).
    speed = np.linalg.norm(v)
    np.testing.assert_allclose(speed, np.hypot(5.0, 2.0), rtol=0.05)


def test_imu_between_frames(kitti_root):
    d = KittiRawDrive(kitti_root, DATE, DRIVE, max_points=2048)
    w = d.imu_between(d.frame_time(0), d.frame_time(1))
    # ~10 records at 100 Hz between 10 Hz frames.
    assert 8 <= len(w) <= 12
    np.testing.assert_allclose(w[:, 2], 9.81, atol=1e-6)   # az
    np.testing.assert_allclose(w[:, 5], 0.05, atol=1e-6)   # wz


def test_relative_pose_gt_from_reader(kitti_root):
    d = KittiRawDrive(kitti_root, DATE, DRIVE, max_points=2048)
    dx, dq = nsp.relative_pose(d.pose(0), d.pose(1))
    # Forward motion of ~0.56 m expressed in the (yawed) body frame.
    dt = d.frame_time(1) - d.frame_time(0)
    expected_norm = np.hypot(5.0, 2.0) * dt
    np.testing.assert_allclose(np.linalg.norm(dx[:2]), expected_norm, rtol=0.1)
    assert abs(dq[0]) > 0.9999  # nearly no rotation


def test_frame_range_start_end(kitti_root):
    d = KittiRawDrive(kitti_root, DATE, DRIVE, max_points=2048, start=2, end=4)
    assert len(d) == 3  # frames 2, 3, 4 (end inclusive)
    full = KittiRawDrive(kitti_root, DATE, DRIVE, max_points=2048)
    np.testing.assert_array_equal(d.points(0)[0], full.points(2)[0])
