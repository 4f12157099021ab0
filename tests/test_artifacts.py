"""Artifact writer tests."""

import json
import os

import numpy as np

from lego_loam_tpu.eval.artifacts import (StageTimer, write_occupancy_pgm,
                                          write_tum_trajectory)


def test_tum_trajectory_format(tmp_path):
    poses = np.zeros((3, 6), np.float32)
    poses[1] = [0, 0, np.pi / 2, 1.0, 2.0, 0.5]
    times = np.asarray([0.0, 0.1, 0.2])
    p = str(tmp_path / "traj.tum")
    write_tum_trajectory(p, poses, times)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 3
    row = [float(x) for x in lines[1].split()]
    assert len(row) == 8
    assert row[0] == 0.1 and row[1] == 1.0 and row[2] == 2.0
    # yaw=pi/2 quaternion: qz = sin(pi/4)
    assert abs(row[6] - np.sin(np.pi / 4)) < 1e-5
    assert abs(row[7] - np.cos(np.pi / 4)) < 1e-5


def test_pgm_writer(tmp_path):
    grid = np.full((64, 64), 50, np.int32)
    grid[10, 20] = 100     # occupied
    grid[30, 40] = 0       # free
    p = str(tmp_path / "map.pgm")
    write_occupancy_pgm(p, grid)
    data = open(p, "rb").read()
    assert data.startswith(b"P5\n64 64\n255\n")
    img = np.frombuffer(data.split(b"\n", 3)[3], np.uint8).reshape(64, 64)
    img = img[::-1]
    assert img[10, 20] == 0
    assert img[30, 40] == 254
    assert img[0, 0] == 205


def test_stage_timer():
    t = StageTimer()
    t.add("a", 0.1)
    t.add("a", 0.3)
    s = t.summary()
    assert s["a"]["count"] == 2
    assert abs(s["a"]["mean_ms"] - 200.0) < 1e-6
