"""Batched point-to-point ICP — the PCL ICP replacement for loop closure.

The reference runs ``pcl::IterativeClosestPoint`` with maxCorrDist 100,
100 iterations, eps 1e-6, no RANSAC (``mapOptmization.cpp:785-796``) and
gates on ``getFitnessScore() < 0.3`` (:798-800).  Here: NN correspondence
via chunked MXU distance blocks + closed-form Horn/Kabsch alignment (3×3
SVD) per iteration inside a `lax.while_loop`; fitness = mean squared NN
distance over valid source points (PCL's definition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import se3
from ..match.pallas_knn import knn5

Array = jax.Array


def _horn(src: Array, tgt: Array, w: Array):
    """Weighted rigid alignment src→tgt: returns pose (6,)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    cs = jnp.sum(src * w[:, None], 0) / wsum
    ct = jnp.sum(tgt * w[:, None], 0) / wsum
    H = ((src - cs) * w[:, None]).T @ (tgt - ct)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    S = jnp.diag(jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det]))
    R = Vt.T @ S @ U.T
    t = ct - R @ cs
    return jnp.concatenate([se3.matrix_to_rpy(R), t])


@functools.partial(jax.jit, static_argnames=("max_iters", "knn_impl"))
def icp_align(src: Array, src_valid: Array, tgt: Array, tgt_valid: Array,
              max_iters: int = 30, max_corr_dist: float = 100.0,
              eps: float = 1.0e-6, knn_impl: str = None):
    """Align ``src`` onto ``tgt``.

    Returns (pose (6,) such that ``apply(pose, src) ≈ tgt``,
    fitness (mean squared NN distance), n_corr).

    ``knn_impl`` selects the 1-NN backend ("xla" | "pallas" — first
    column of the shared 5-NN, ``match/pallas_knn.py``); callers inside
    the pipeline pass ``MappingConfig.knn_impl`` so ONE config toggle
    governs every kNN call site.  None falls back to the knn5 default
    (env ``LEGO_KNN_IMPL``, else "xla" — the measured-faster path).
    """
    max_d2 = max_corr_dist ** 2

    def nn_fit(pose):
        moved = se3.apply(pose, src)
        idx, d2s = knn5(moved, src_valid, tgt, tgt_valid, impl=knn_impl)
        match = tgt[idx[:, 0]]
        # exact distances for weights and PCL-style fitness (the
        # selection matrix runs at Precision.HIGH — see pairwise_sqdist)
        d2 = jnp.sum((moved - match) ** 2, axis=-1)
        d2 = jnp.where(d2s[:, 0] >= 1e30, d2s[:, 0], d2)  # no candidate
        w = (src_valid & (d2 < max_d2) & jnp.isfinite(d2)).astype(
            jnp.float32)
        return moved, match, w, d2

    def body(state):
        pose, _, it, _ = state
        moved, match, w, d2 = nn_fit(pose)
        corr = _horn(moved, match, w)
        new_pose = se3.compose(corr, pose)
        delta = jnp.sum((new_pose - pose) ** 2)
        return new_pose, delta, it + 1, jnp.sum(w)

    def cond(state):
        _, delta, it, _ = state
        return (it < max_iters) & (delta > eps)

    init = (jnp.zeros((6,), src.dtype), jnp.float32(1.0), jnp.int32(0),
            jnp.float32(0.0))
    pose, _, _, _ = jax.lax.while_loop(cond, body, init)

    _, _, w, d2 = nn_fit(pose)
    n_corr = jnp.sum(w)
    fitness = jnp.sum(jnp.where(w > 0, d2, 0.0)) / jnp.maximum(n_corr, 1.0)
    return pose, fitness, n_corr
