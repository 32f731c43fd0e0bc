"""KittiRawDrive reader test against a synthesized on-disk KITTI raw tree
(exact devkit layout: velodyne .bin, 30-field OXTS records, timestamp
files) — validates the real-data path without real data (SURVEY.md §2.2).
Tree synthesis shared with the KITTI end-to-end test: tests/_kitti_tree.py."""

import numpy as np
import pytest

from deeplio_tpu.data import np_spatial as nsp
from deeplio_tpu.data.drives import KittiRawDrive

from .._kitti_tree import DATE, DRIVE, make_kitti_tree

N_FRAMES = 6


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_raw")
    make_kitti_tree(root, n_frames=N_FRAMES)
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
