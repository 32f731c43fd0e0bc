"""Synthesize an on-disk KITTI raw tree (exact devkit layout: velodyne
.bin, 30-field OXTS records, timestamp files) so the real-data path is
testable without real data (SURVEY.md §2.2). Shared by the reader unit
tests and the KITTI-layout end-to-end integration test."""

import datetime as dt

import numpy as np

from deeplio_tpu.data import np_spatial as nsp

DATE = "2011_10_03"
DRIVE = 27
LAT0, LON0, ALT0 = 48.9843445, 8.4295857, 116.43


def write_timestamps(path, times):
    base = dt.datetime(2011, 10, 3, 12, 55, 34)
    with open(path, "w") as f:
        for t in times:
            stamp = base + dt.timedelta(seconds=float(t))
            ns = int((t % 1) * 1e9) % 1000
            f.write(stamp.strftime("%Y-%m-%d %H:%M:%S.%f") + f"{ns:03d}\n")


def make_kitti_tree(root, n_frames=6, date=DATE, drive=DRIVE, seed=0,
                    n_points=(5000, 8000)):
    """Write one drive under ``root``; returns the drive's base dir."""
    base = root / date / f"{date}_drive_{drive:04d}_sync"
    velo = base / "velodyne_points"
    oxts = base / "oxts"
    (velo / "data").mkdir(parents=True)
    (oxts / "data").mkdir(parents=True)

    rng = np.random.default_rng(seed)
    frame_times = np.arange(n_frames) * 0.1037
    write_timestamps(velo / "timestamps.txt", frame_times)
    for i in range(n_frames):
        n = int(rng.integers(*n_points))
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
    write_timestamps(oxts / "timestamps.txt", oxts_times)
    scale = np.cos(np.deg2rad(LAT0))
    er = nsp.EARTH_RADIUS
    for k, t in enumerate(oxts_times):
        x = 5.0 * t          # m east
        y = 2.0 * t          # m north
        lon = LON0 + np.rad2deg(x / (scale * er))
        lat = np.rad2deg(
            2 * np.arctan(np.exp((y + er * scale * np.log(
                np.tan(np.deg2rad(90 + LAT0) / 2))) / (er * scale)))
            - np.pi / 2)
        rec = np.zeros(30)
        rec[0], rec[1], rec[2] = lat, lon, ALT0 + 0.01 * t
        rec[5] = 0.38         # yaw
        rec[11:14] = [0.5, 0.01, 9.81]   # ax ay az
        rec[17:20] = [0.001, 0.002, 0.05]  # wx wy wz
        np.savetxt(oxts / "data" / f"{k:010d}.txt", rec[None], fmt="%.9f")
    return base
