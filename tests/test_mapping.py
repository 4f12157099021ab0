"""Scan-to-map + keyframe store + full-pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.solve.scan2map import MapCloud, scan_to_map
from lego_loam_tpu.graph.keyframes import empty_store, insert_keyframe, \
    assemble_submap, assemble_global_map
from lego_loam_tpu.io.npz_io import pack_sequence
from lego_loam_tpu.pipeline.slam import init_state, replay, slam_step
from lego_loam_tpu.eval.metrics import ate

CFG = vlp16()


def _pad(pts, cap):
    out = np.zeros((cap, 3), np.float32)
    v = np.zeros((cap,), bool)
    n = min(len(pts), cap)
    out[:n] = pts[:n]
    v[:n] = True
    return jnp.asarray(out), jnp.asarray(v)


def test_scan_to_map_recovers_pose():
    """World map of a plane + vertical lines; perturbed initial pose must
    converge back to truth."""
    rng = np.random.default_rng(1)
    # surf map: ground plane + two wall planes (walls constrain tx/ty —
    # without them the degeneracy guard correctly freezes translation)
    gx, gy = np.meshgrid(np.linspace(-10, 10, 60), np.linspace(-10, 10, 60))
    ground = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], 1)
    wy, wz = np.meshgrid(np.linspace(-10, 10, 50), np.linspace(0, 3, 12))
    wall_x = np.stack([np.full(wy.size, 10.0), wy.ravel(), wz.ravel()], 1)
    wall_y = np.stack([wy.ravel(), np.full(wy.size, -10.0), wz.ravel()], 1)
    surf = np.concatenate([ground, wall_x, wall_y], 0)
    surf += rng.normal(0, 0.002, surf.shape)
    # corner map: 12 vertical poles with dense points
    corners = []
    for px, py in rng.uniform(-9, 9, (12, 2)):
        for z in np.linspace(0, 3, 60):
            corners.append([px, py, z])
    corners = np.asarray(corners) + rng.normal(0, 0.002, (len(corners), 3))

    corner_map = MapCloud(*_pad(corners, CFG.mapping.max_map_corner))
    surf_map = MapCloud(*_pad(surf, CFG.mapping.max_map_surf))

    true_pose = jnp.asarray([0.02, -0.01, 0.3, 1.5, -2.0, 0.8], jnp.float32)
    # current scan = world points seen from true_pose (sensor frame)
    scan_corner = np.asarray(se3.apply_inverse(true_pose,
                                               jnp.asarray(corners)))
    scan_surf = np.asarray(se3.apply_inverse(true_pose,
                                             jnp.asarray(surf[::2])))
    c_pts, c_ok = _pad(scan_corner, 1024)
    s_pts, s_ok = _pad(scan_surf, 2048)

    pose0 = true_pose + jnp.asarray([0.01, 0.01, -0.05, 0.2, -0.15, 0.1])
    pose = scan_to_map(pose0, c_pts, c_ok, s_pts, s_ok,
                       corner_map, surf_map, CFG)
    err = np.abs(np.asarray(pose - true_pose))
    assert err[:3].max() < 0.005, err
    assert err[3:].max() < 0.02, err


def test_scan_to_map_skips_thin_map():
    empty = MapCloud(jnp.zeros((CFG.mapping.max_map_corner, 3)),
                     jnp.zeros((CFG.mapping.max_map_corner,), bool))
    empty_s = MapCloud(jnp.zeros((CFG.mapping.max_map_surf, 3)),
                       jnp.zeros((CFG.mapping.max_map_surf,), bool))
    pose0 = jnp.asarray([0, 0, 0.5, 1, 2, 3], jnp.float32)
    pose = scan_to_map(pose0, jnp.zeros((1024, 3)),
                       jnp.zeros(1024, bool), jnp.zeros((2048, 3)),
                       jnp.zeros(2048, bool), empty, empty_s, CFG)
    np.testing.assert_allclose(pose, pose0)


def test_keyframe_store_and_submap():
    store = empty_store(CFG)
    rng = np.random.default_rng(0)
    for i in range(5):
        pose = jnp.asarray([0, 0, 0, 2.0 * i, 0, 0], jnp.float32)
        pts = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
        c, cv = _pad(pts, 1024)
        s, sv = _pad(pts, 2048)
        o, ov = _pad(pts[:8], 512)
        s2, s2v = _pad(pts[:8], 512)
        store = insert_keyframe(store, pose, jnp.float32(i), c, cv, s, sv,
                                o, ov, s2, s2v)
    assert int(store.count) == 5
    corner_map, surf_map = assemble_submap(
        store, jnp.asarray([0, 0, 0, 4.0, 0, 0], jnp.float32), CFG,
        window=50)
    assert int(jnp.sum(corner_map.valid)) > 0
    assert int(jnp.sum(surf_map.valid)) > 0
    # all submap points finite
    assert np.isfinite(np.asarray(corner_map.xyz)).all()

    # publishGlobalMap parity: world-frame union of all keyframes,
    # transformed by keyframe pose and downsampled
    gm_xyz, gm_ok = assemble_global_map(store, store.pose[0], CFG,
                                        max_frames=8, capacity=4096)
    gm = np.asarray(gm_xyz)[np.asarray(gm_ok)]
    assert len(gm) > 0 and np.isfinite(gm).all()
    # keyframe 4 sits at x=8: its points (sensor frame ±5 m) must appear
    # shifted into world frame, so the global map spans past x=5
    assert gm[:, 0].max() > 5.0


@pytest.mark.slow
def test_full_pipeline_replay(small_sequence):
    scans, gt, times = small_sequence
    xyz, valid, t = pack_sequence(scans, times, CFG)
    final_state, outs = replay(xyz, valid, t, CFG)
    fused = np.asarray(outs["fused"])
    assert fused.shape == (len(scans), 6)
    assert np.isfinite(fused).all()
    gt_j = jnp.asarray(gt)
    gt_rel = np.asarray(jax.vmap(lambda g: se3.relative(gt_j[0], g))(gt_j))
    m = ate(fused[:-1], gt_rel[1:len(fused)], align=False)
    assert m["rmse"] < 0.3, m
    assert int(final_state.mapping.store.count) >= 1
