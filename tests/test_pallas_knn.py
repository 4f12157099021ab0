"""Fused Pallas 5-NN vs the exact brute-force oracle (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.match import pallas_knn
from lego_loam_tpu.match.bruteforce import knn


@pytest.fixture()
def case():
    rng = np.random.default_rng(3)
    # production-scale M: shadowing odds scale as 10 / (M/16) per query
    Q, M = 300, 16384
    q = (rng.uniform(-30, 30, (Q, 3)) + 200.0).astype(np.float32)
    c = (rng.uniform(-30, 30, (M, 3)) + 200.0).astype(np.float32)
    qv = rng.random(Q) > 0.1
    cv = rng.random(M) > 0.1
    return (jnp.asarray(q), jnp.asarray(qv),
            jnp.asarray(c), jnp.asarray(cv))


def test_knn5_matches_oracle(case, monkeypatch):
    q, qv, c, cv = case
    # run the kernel in interpreter mode on CPU
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setattr(pallas_knn.pl, "pallas_call", interp_call)

    idx_p, d2_p = pallas_knn.knn5_pallas(q, qv, c, cv)
    idx_o, d2_o = knn(q, qv, c, cv, k=5)

    d2_p, d2_o = np.asarray(d2_p), np.asarray(d2_o)
    idx_p, idx_o = np.asarray(idx_p), np.asarray(idx_o)
    qv = np.asarray(qv)

    # invalid queries are +inf
    assert np.all(d2_p[~qv] > 1e30)

    # per-query neighbour sets match except rare group shadowing
    # (two true top-5 sharing one 16-candidate tournament group);
    # require >=97% exact-set agreement and >=99% pair recall, and the
    # nearest neighbour must always be exact (a group minimum is never
    # shadowed)
    match = 0
    found = 0
    for i in np.nonzero(qv)[0]:
        assert idx_p[i][0] == idx_o[i][0]
        inter = len(set(idx_p[i]) & set(idx_o[i]))
        found += inter
        match += inter == 5
    n = int(qv.sum())
    assert match / n >= 0.97
    assert found / (5 * n) >= 0.99

    # exact distances for the winners, ascending
    for i in np.nonzero(qv)[0][:50]:
        ref = np.sum((np.asarray(c)[idx_p[i]] - np.asarray(q)[i]) ** 2, -1)
        np.testing.assert_allclose(d2_p[i], ref, rtol=1e-5, atol=1e-5)
        assert np.all(np.diff(d2_p[i]) >= -1e-6)


def test_pairwise_sqdist_far_from_origin():
    """Distance computation must stay accurate at world-frame offsets —
    the naive norm-expansion matmul loses hundreds of m² at 100-400 m
    (bf16 matmul inputs + catastrophic cancellation on TPU), silently
    defeating every radius gate."""
    from lego_loam_tpu.match.bruteforce import pairwise_sqdist
    rng = np.random.default_rng(0)
    for off in (0.0, 100.0, 400.0):
        q = (rng.uniform(-30, 30, (128, 3)) + off).astype(np.float32)
        c = (rng.uniform(-30, 30, (1024, 3)) + off).astype(np.float32)
        d2 = np.asarray(pairwise_sqdist(jnp.asarray(q), jnp.asarray(c)))
        ref = ((q[:, None, :].astype(np.float64)
                - c[None, :, :]) ** 2).sum(-1)
        assert np.abs(d2 - ref).max() < 0.05, off
