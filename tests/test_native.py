"""Native host runtime (C++ channel + packer) tests."""

import threading

import numpy as np

from lego_loam_tpu.io.native_feeder import (ScanChannel, native_available,
                                            pack_scan_native)


def test_native_lib_builds():
    assert native_available(), "libfeeder.so should build via g++"


def test_pack_scan_matches_python_oracle():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    pts[::7] = np.nan
    pts[3, 0] = np.inf
    xyz, valid, n = pack_scan_native(pts, 600)
    finite = np.isfinite(pts).all(axis=-1)
    assert n == int(finite.sum())
    np.testing.assert_array_equal(valid[:500], finite)
    assert not valid[500:].any()
    np.testing.assert_allclose(xyz[:500][finite], pts[finite])
    assert (xyz[:500][~finite] == 0).all()


def test_pack_scan_capacity_clip():
    pts = np.ones((100, 3), np.float32)
    xyz, valid, n = pack_scan_native(pts, 40)
    assert n == 40 and valid[:40].all() and xyz.shape == (40, 3)


def test_channel_lockstep_roundtrip():
    ch = ScanChannel(capacity_points=128, depth=1)
    results = []

    def consumer():
        while True:
            item = ch.recv()
            if item is None:
                break
            results.append(item)

    th = threading.Thread(target=consumer)
    th.start()
    for i in range(5):
        pts = np.full((10, 3), float(i), np.float32)
        assert ch.send(pts, stamp=float(i))
    ch.close()
    th.join(timeout=5)
    assert len(results) == 5
    for i, (xyz, valid, stamp) in enumerate(results):
        assert stamp == float(i)
        assert valid[:10].all() and not valid[10:].any()
        np.testing.assert_allclose(xyz[:10], float(i))
