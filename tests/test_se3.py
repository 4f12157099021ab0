import numpy as np
import jax.numpy as jnp
import pytest

from lego_loam_tpu.core import se3


def rand_pose(rng, scale=1.0):
    return jnp.asarray(np.concatenate([
        rng.uniform(-0.5, 0.5, 3) * scale,
        rng.uniform(-5, 5, 3) * scale]), jnp.float32)


def test_matrix_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = rand_pose(rng)
        T = se3.pose_matrix(p)
        p2 = se3.matrix_to_pose(T)
        np.testing.assert_allclose(p, p2, atol=1e-5)


def test_compose_matches_matrix_product():
    rng = np.random.default_rng(1)
    a, b = rand_pose(rng), rand_pose(rng)
    T = se3.pose_matrix(se3.compose(a, b))
    np.testing.assert_allclose(
        T, se3.pose_matrix(a) @ se3.pose_matrix(b), atol=1e-5)


def test_inverse_and_relative():
    rng = np.random.default_rng(2)
    a, b = rand_pose(rng), rand_pose(rng)
    ident = se3.compose(a, se3.inverse(a))
    np.testing.assert_allclose(ident, np.zeros(6), atol=1e-5)
    rel = se3.relative(a, b)
    np.testing.assert_allclose(se3.compose(a, rel), b, atol=1e-4)


def test_apply_roundtrip():
    rng = np.random.default_rng(3)
    p = rand_pose(rng)
    pts = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    back = se3.apply_inverse(p, se3.apply(p, pts))
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.uniform(-1, 1, (10, 3)), jnp.float32)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(w, w2, atol=1e-4)
    # tiny angles
    w_small = jnp.asarray([[1e-8, -1e-8, 1e-9]], jnp.float32)
    assert np.all(np.isfinite(se3.so3_log(se3.so3_exp(w_small))))
