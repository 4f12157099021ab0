"""Odometry solver tests: synthetic rigid recovery + end-to-end ATE."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.core.types import FeatureCloud
from lego_loam_tpu.io.npz_io import pack_raw_scan
from lego_loam_tpu.frontend.segmentation import image_projection
from lego_loam_tpu.pipeline.odometry import init_state, odometry_step
from lego_loam_tpu.solve.odometry import two_step_odometry
from lego_loam_tpu.eval.metrics import ate

CFG = vlp16()


def _cloud(xyz, ring, cap):
    n = xyz.shape[0]
    out = np.zeros((cap, 3), np.float32)
    rg = np.zeros((cap,), np.float32)
    rt = np.ones((cap,), np.float32)          # rel_time=1: full sensitivity
    vd = np.zeros((cap,), bool)
    out[:n] = xyz
    rg[:n] = ring
    vd[:n] = True
    return FeatureCloud(xyz=jnp.asarray(out), ring=jnp.asarray(rg),
                        rel_time=jnp.asarray(rt), valid=jnp.asarray(vd))


def test_two_step_recovers_known_motion():
    """Construct ground-plane surf features + vertical-line corner features,
    apply a known sweep motion, check θ recovery."""
    rng = np.random.default_rng(0)
    f = CFG.feature

    # last surf cloud: grid on ground plane z=-0.8, rings 0..3
    gx, gy = np.meshgrid(np.linspace(2, 10, 24), np.linspace(-6, 6, 24))
    surf = np.stack([gx.ravel(), gy.ravel(),
                     np.full(gx.size, -0.8)], 1).astype(np.float32)
    surf_ring = np.tile(np.arange(4), surf.shape[0] // 4 + 1)[:surf.shape[0]]

    # last corner cloud: points on 8 vertical poles, rings 0..7
    corners = []
    cring = []
    for px, py in rng.uniform(-8, 8, (8, 2)):
        if abs(px) < 2 and abs(py) < 2:
            px += 4
        for r in range(8):
            corners.append([px, py, -0.5 + 0.25 * r])
            cring.append(r)
    corner = np.asarray(corners, np.float32)
    cring = np.asarray(cring, np.float32)

    last_surf = _cloud(surf, surf_ring, f.max_less_flat)
    last_corner = _cloud(corner, cring, f.max_less_sharp)

    theta_true = jnp.asarray(
        [0.01, -0.008, 0.03, 0.12, 0.05, 0.02], jnp.float32)

    # current features observed at s=1 (fire frame == end frame):
    # p_fire = world point in end frame = inverse(theta) ⊗ p_world
    cur_flat_xyz = np.asarray(se3.apply_inverse(theta_true,
                                                jnp.asarray(surf)))
    cur_sharp_xyz = np.asarray(se3.apply_inverse(theta_true,
                                                 jnp.asarray(corner)))
    flat = _cloud(cur_flat_xyz, surf_ring, f.max_flat * 2)
    sharp = _cloud(cur_sharp_xyz, cring, f.max_sharp * 2)

    theta0 = jnp.zeros(6, jnp.float32)
    theta = two_step_odometry(theta0, sharp, flat, last_corner, last_surf,
                              CFG)
    err = np.abs(np.asarray(theta) - np.asarray(theta_true))
    assert err[:3].max() < 0.01, err           # rotations within 0.6 deg
    assert err[3:].max() < 0.03, err           # translations within 3 cm


def test_odometry_skips_when_features_thin():
    f = CFG.feature
    empty = _cloud(np.zeros((0, 3), np.float32), np.zeros(0),
                   f.max_less_flat)
    theta0 = jnp.asarray([0.0, 0.0, 0.1, 0.5, 0.0, 0.0], jnp.float32)
    theta = two_step_odometry(
        theta0, _cloud(np.zeros((0, 3), np.float32), np.zeros(0), 64),
        _cloud(np.zeros((0, 3), np.float32), np.zeros(0), 64),
        empty, empty, CFG)
    np.testing.assert_allclose(theta, theta0)


@pytest.mark.slow
def test_end_to_end_odometry_ate(small_sequence):
    scans, gt, times = small_sequence
    state = init_state(CFG)
    est = []
    for i, pts in enumerate(scans):
        raw = pack_raw_scan(pts, float(times[i]), CFG.pipeline.max_points)
        proj = image_projection(raw, CFG)
        state, out = odometry_step(state, proj, CFG)
        est.append(np.asarray(out.odom))
    est = np.asarray(est)
    # odom poses are at sweep END, relative to the sweep-0 START frame;
    # gt[i] is the world-frame pose at sweep-i start: compare est[i]
    # against inverse(gt[0]) ∘ gt[i+1]
    gt_j = jnp.asarray(gt)
    gt_rel = np.asarray(jax.vmap(
        lambda g: se3.relative(gt_j[0], g))(gt_j))
    m = ate(est[:-1], gt_rel[1:len(est)], align=False)
    assert np.isfinite(m["rmse"])
    assert m["rmse"] < 0.25, m
