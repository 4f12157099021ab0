import numpy as np
import jax.numpy as jnp

from lego_loam_tpu.core.linalg3 import (eigvals_sym3,
                                        principal_eigvec_sym3, solve3,
                                        topk_small_min)


def _rand_sym(rng, n):
    A = rng.normal(size=(n, 3, 3))
    return (A + A.transpose(0, 2, 1)).astype(np.float32)


def test_solve3_matches_numpy():
    rng = np.random.default_rng(0)
    A = _rand_sym(rng, 64) + 4.0 * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(64, 3)).astype(np.float32)
    x = np.asarray(solve3(jnp.asarray(A), jnp.asarray(b)))
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


def test_eigvals_sym3_matches_numpy():
    rng = np.random.default_rng(1)
    A = _rand_sym(rng, 128)
    ev = np.asarray(eigvals_sym3(jnp.asarray(A)))
    ev_ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(ev, ev_ref, rtol=1e-3, atol=1e-3)
    # ascending order
    assert (np.diff(ev, axis=-1) >= -1e-4).all()


def test_principal_eigvec_line_case():
    """Covariance of near-collinear points: principal direction must be
    the line direction (the corner-association case)."""
    rng = np.random.default_rng(2)
    for _ in range(10):
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        t = rng.normal(size=(20, 1))
        pts = t * u + rng.normal(0, 0.01, (20, 3))
        pts = pts - pts.mean(0)
        cov = (pts.T @ pts / len(pts)).astype(np.float32)[None]
        ev = eigvals_sym3(jnp.asarray(cov))
        v = np.asarray(principal_eigvec_sym3(jnp.asarray(cov),
                                             ev[:, 2]))[0]
        assert abs(abs(v @ u) - 1.0) < 1e-3


def test_topk_small_min_matches_sort():
    rng = np.random.default_rng(3)
    d = rng.normal(size=(32, 100)).astype(np.float32)
    v, i = topk_small_min(jnp.asarray(d), 5)
    v_ref = np.sort(d, axis=-1)[:, :5]
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-6)
    np.testing.assert_allclose(
        np.take_along_axis(d, np.asarray(i), axis=-1), v_ref, atol=1e-6)
