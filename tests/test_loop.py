"""Loop closure: ICP alignment, candidate detection, end-to-end closure."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.loop.icp import icp_align
from lego_loam_tpu.loop.detect import find_candidate
from lego_loam_tpu.graph.keyframes import empty_store, insert_keyframe

CFG = vlp16()


def _pad(pts, cap):
    out = np.zeros((cap, 3), np.float32)
    v = np.zeros((cap,), bool)
    n = min(len(pts), cap)
    out[:n] = pts[:n]
    v[:n] = True
    return jnp.asarray(out), jnp.asarray(v)


def test_icp_recovers_transform():
    rng = np.random.default_rng(0)
    # structured cloud: two walls + scattered points
    a = rng.uniform(-5, 5, (800, 3)).astype(np.float32)
    a[:300, 2] = 0.0                   # ground patch
    a[300:500, 0] = 4.0                # wall x
    a[500:700, 1] = -3.0               # wall y
    true_pose = jnp.asarray([0.02, -0.03, 0.15, 0.4, -0.3, 0.2],
                            jnp.float32)
    b = np.asarray(se3.apply(true_pose, jnp.asarray(a)))

    src, src_v = _pad(a, 4096)
    tgt, tgt_v = _pad(b, 4096)
    pose, fitness, n_corr = icp_align(src, src_v, tgt, tgt_v,
                                      max_iters=50)
    err = np.abs(np.asarray(pose) - np.asarray(true_pose))
    assert err.max() < 0.02, (err, float(fitness))
    assert float(fitness) < 1e-3
    assert int(n_corr) == 800


def test_icp_fitness_high_for_unrelated_clouds():
    rng = np.random.default_rng(1)
    a = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    b = rng.uniform(40, 60, (500, 3)).astype(np.float32)
    src, src_v = _pad(a, 4096)
    tgt, tgt_v = _pad(b, 4096)
    pose, fitness, _ = icp_align(src, src_v, tgt, tgt_v, max_iters=20)
    assert float(fitness) > CFG.mapping.history_keyframe_fitness_score


def test_find_candidate_respects_time_and_radius():
    store = empty_store(CFG)
    z = np.zeros((1024, 3), np.float32)
    zv = np.zeros((1024,), bool)
    dummy = dict(corner=jnp.asarray(z), corner_valid=jnp.asarray(zv))
    for i in range(60):
        # straight out 15 keyframes then back: pose 59 near pose 0
        x = min(i, 30 - abs(i - 30)) if i < 60 else 0
        pose = jnp.asarray([0, 0, 0, float(min(i, 59 - i)), 0, 0],
                           jnp.float32)
        store = insert_keyframe(
            store, pose, jnp.float32(i * 1.0),
            jnp.zeros((1024, 3)), jnp.zeros((1024,), bool),
            jnp.zeros((2048, 3)), jnp.zeros((2048,), bool),
            jnp.zeros((512, 3)), jnp.zeros((512,), bool),
            jnp.zeros((512, 3)), jnp.zeros((512,), bool))
    cur_pose = store.pose[59]
    found, idx = find_candidate(store, cur_pose, jnp.float32(59.0), CFG)
    assert bool(found)
    # candidate must be ≥30 s older and within 7 m
    assert float(jnp.float32(59.0) - store.stamp[idx]) > 30.0
    d = float(jnp.linalg.norm(store.pose[idx][3:] - cur_pose[3:]))
    assert d < CFG.mapping.history_keyframe_search_radius

    # no candidate when everything is recent
    found2, _ = find_candidate(store, cur_pose, jnp.float32(20.0), CFG)
    assert not bool(found2)


def test_low_overlap_deceptive_fitness_rejected():
    """The case the undocumented-until-r4 ``n_corr > 100`` gate protects
    against (loop/detect.py): a near-disjoint alignment whose few inlier
    correspondences produce a deceptively LOW mean-squared fitness.  The
    reference accepts on ``converged ∧ fitness < 0.3`` alone
    (mapOptmization.cpp:798-800) and relies on PCL's hasConverged();
    our fixed-iteration Horn ICP substitutes the correspondence floor."""
    rng = np.random.default_rng(4)
    tgt_pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    tgt_pts[:800, 2] = 0.0
    tgt_pts[800:1400, 0] = 4.0
    tgt, tgt_v = _pad(tgt_pts, 4096)

    # source = 40 exact copies of target points (perfect inliers), rest
    # of the cloud far away (outside max_corr_dist → not correspondences)
    src_pts = rng.uniform(200, 210, (600, 3)).astype(np.float32)
    src_pts[:40] = tgt_pts[:40]
    src, src_v = _pad(src_pts, 4096)

    m = CFG.mapping
    pose, fitness, n_corr = icp_align(
        src, src_v, tgt, tgt_v, max_iters=m.icp_max_iters,
        max_corr_dist=m.icp_max_corr_dist, eps=m.icp_eps)
    # fitness-only (the reference's gate) would ACCEPT this garbage:
    assert float(fitness) < m.history_keyframe_fitness_score, \
        float(fitness)
    # ...but the correspondence floor rejects it:
    assert int(n_corr) <= 100, int(n_corr)
    ok = (float(fitness) < m.history_keyframe_fitness_score) \
        and (int(n_corr) > 100)
    assert not ok


def test_implausible_rotation_correction_rejected():
    """Correction-plausibility gate (config.py::
    loop_max_correction_rot_deg): in a rotationally ambiguous scene,
    point-to-point ICP happily converges to a rotated alignment with
    near-zero fitness — measured live on the 20 K Stevens run, where
    ONE accepted 6.06° "correction" at the figure-eight crossing
    (fitness 0.025, far under the 0.3 gate) rewrote the frame and sent
    the trajectory to 564 m ATE.  At the ~15-scan anchor cadence the
    attitude drift between closures is < 0.2°, so a multi-degree
    correction is implausible REGARDLESS of fitness; only the rotation
    gate catches it.  Here: a 12-fold-symmetric pillar ring offset by
    10° aligns perfectly (fitness ~0) with a 10° claimed rotation."""
    m = CFG.mapping
    rng = np.random.default_rng(8)
    ang = np.repeat(np.arange(12) * np.pi / 6, 120)
    pillar = np.stack([8 * np.cos(ang), 8 * np.sin(ang),
                       np.tile(np.linspace(0, 3, 120), 12)], 1)
    pillar += rng.normal(0, 0.01, pillar.shape)
    tgt_pts = pillar.astype(np.float32)
    c, s = np.cos(np.deg2rad(10)), np.sin(np.deg2rad(10))
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    src_pts = (tgt_pts @ R.T).astype(np.float32)

    tgt, tgt_v = _pad(tgt_pts, 4096)
    src, src_v = _pad(src_pts, 4096)
    pose, fitness, n_corr = icp_align(
        src, src_v, tgt, tgt_v, max_iters=m.icp_max_iters,
        max_corr_dist=m.icp_max_corr_dist, eps=m.icp_eps)
    rot_deg = np.degrees(np.max(np.abs(np.asarray(pose[:3]))))
    # passes the reference-style fitness gate and the n_corr floor...
    assert float(fitness) < m.history_keyframe_fitness_score, float(fitness)
    assert int(n_corr) > 100
    # ...but demands an implausible rotation, which the gate rejects
    assert rot_deg > m.loop_max_correction_rot_deg, rot_deg
    ok = (float(fitness) < m.history_keyframe_fitness_score) \
        and (int(n_corr) > 100) \
        and (rot_deg < m.loop_max_correction_rot_deg)
    assert not ok
