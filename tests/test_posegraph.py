"""Pose-graph optimizer tests: chain + loop closure correction."""

import numpy as np
import jax
import jax.numpy as jnp

from lego_loam_tpu.core import se3
from lego_loam_tpu.graph.posegraph import (add_factor, empty_graph,
                                           between_residual,
                                           optimize_poses)

ODOM_W = jnp.asarray([1e3, 1e3, 1e3, 1e2, 1e2, 1e2], jnp.float32)
LOOP_W = jnp.asarray([300.0, 300.0, 300.0, 100.0, 100.0, 100.0],
                     jnp.float32)


def np_rpy(rpy):
    from lego_loam_tpu.eval.metrics import _rpy_to_matrix
    return _rpy_to_matrix(np.asarray(rpy))


def np_between(pi, pj, z):
    """NumPy oracle of posegraph.between_residual."""
    Ri, Rj, Rz = np_rpy(pi[:3]), np_rpy(pj[:3]), np_rpy(z[:3])
    Re = Rz.T @ Ri.T @ Rj
    te = Rz.T @ (Ri.T @ (pj[3:] - pi[3:]) - z[3:])
    w = np.array([Re[2, 1] - Re[1, 2], Re[0, 2] - Re[2, 0],
                  Re[1, 0] - Re[0, 1]])
    s2 = np.linalg.norm(w)
    th = np.arctan2(s2, np.trace(Re) - 1)
    scale = 0.5 + th * th / 12 if s2 < 1e-6 else th / s2
    return np.concatenate([scale * w, te])


def build_square(n_side=10, drift_yaw=0.002, noise=0.0, seed=0):
    """Ground truth: square loop.  Odometry: drifted measurements."""
    rng = np.random.default_rng(seed)
    step = 1.0
    gt = [np.zeros(6, np.float32)]
    meas = []
    for k in range(4 * n_side):
        turn = (k % n_side == n_side - 1)
        z = np.array([0, 0, np.pi / 2 if turn else 0.0, step, 0, 0],
                     np.float32)
        gt.append(np.asarray(
            se3.compose(jnp.asarray(gt[-1]), jnp.asarray(z))))
        zm = z.copy()
        zm[2] += drift_yaw + rng.normal(0, noise)
        zm[3] += rng.normal(0, noise)
        meas.append(zm)
    return np.asarray(gt), np.asarray(meas)


def test_between_residual_zero_at_truth():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)
    z = se3.relative(a, b)
    r = between_residual(a, b, z)
    np.testing.assert_allclose(r, np.zeros(6), atol=1e-5)


def test_chain_without_loops_matches_composition():
    gt, meas = build_square(n_side=5)
    K = 64
    n = len(meas) + 1
    g = empty_graph(256)
    count = jnp.int32(0)
    poses = np.zeros((K, 6), np.float32)
    # integrate measurements for initial estimate (what the pipeline does)
    for k, z in enumerate(meas):
        poses[k + 1] = np.asarray(
            se3.compose(jnp.asarray(poses[k]), jnp.asarray(z)))
        g, count = add_factor(g, count, jnp.int32(k), jnp.int32(k + 1),
                              jnp.asarray(z), ODOM_W)
    out = optimize_poses(jnp.asarray(poses), jnp.int32(n), g)
    # without loop factors the MAP solution IS the composed odometry
    np.testing.assert_allclose(np.asarray(out)[:n], poses[:n], atol=5e-3)


def test_loop_closure_corrects_drift():
    gt, meas = build_square(n_side=10, drift_yaw=0.004, noise=0.001)
    n = len(meas) + 1
    K = 64
    g = empty_graph(256)
    count = jnp.int32(0)
    poses = np.zeros((K, 6), np.float32)
    for k, z in enumerate(meas):
        poses[k + 1] = np.asarray(
            se3.compose(jnp.asarray(poses[k]), jnp.asarray(z)))
        g, count = add_factor(g, count, jnp.int32(k), jnp.int32(k + 1),
                              jnp.asarray(z), ODOM_W)
    drift_before = np.linalg.norm(poses[n - 1][3:] - gt[n - 1][3:])
    assert drift_before > 0.3    # drift is meaningful

    # loop factor: node n-1 observed at its true relative pose from node 0
    z_loop = se3.relative(jnp.asarray(gt[0]), jnp.asarray(gt[n - 1]))
    g, count = add_factor(g, count, jnp.int32(0), jnp.int32(n - 1),
                          z_loop, LOOP_W)
    out = np.asarray(optimize_poses(jnp.asarray(poses), jnp.int32(n), g,
                                    gn_iters=16, pcg_iters=128))
    err_after = np.linalg.norm(out[:n, 3:] - gt[:n, 3:], axis=1)
    drift_after = err_after[n - 1]
    assert drift_after < 0.05, (drift_before, drift_after)
    # whole-trajectory error shrinks a lot
    err_before = np.linalg.norm(poses[:n, 3:] - gt[:n, 3:], axis=1)
    assert err_after.mean() < 0.35 * err_before.mean()
    assert np.isfinite(out).all()

    # and the solution is the true MAP: compare against scipy on the
    # identical cost (NumPy oracle residuals)
    from scipy.optimize import least_squares
    nf = int(count)
    gi, gj = np.asarray(g.i)[:nf], np.asarray(g.j)[:nf]
    gz = np.asarray(g.z)[:nf].astype(np.float64)
    gw = np.asarray(g.weight)[:nf].astype(np.float64)

    def resid(x):
        p = np.concatenate([np.zeros((1, 6)), x.reshape(n - 1, 6)])
        return np.concatenate([np_between(p[i], p[j], z) * w
                               for i, j, z, w in zip(gi, gj, gz, gw)])

    sol = least_squares(resid, poses[1:n].reshape(-1).astype(np.float64),
                        method="trf", max_nfev=60)
    cost_ours = np.sum(resid(out[1:n].reshape(-1).astype(np.float64)) ** 2)
    cost_ref = np.sum(resid(sol.x) ** 2)
    assert cost_ours <= cost_ref * 1.001, (cost_ours, cost_ref)


def test_optimize_respects_node_count():
    """Frozen padding nodes must stay untouched."""
    g = empty_graph(16)
    count = jnp.int32(0)
    z = jnp.asarray([0, 0, 0, 1, 0, 0], jnp.float32)
    g, count = add_factor(g, count, jnp.int32(0), jnp.int32(1), z, ODOM_W)
    poses = jnp.zeros((8, 6), jnp.float32).at[1].set(z)
    sentinel = jnp.full((6,), 7.0, jnp.float32)
    poses = poses.at[5].set(sentinel)
    out = optimize_poses(poses, jnp.int32(2), g)
    np.testing.assert_allclose(np.asarray(out)[5], np.asarray(sentinel))
