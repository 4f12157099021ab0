"""Closed-form small linear algebra — batched 3×3 ops without LAPACK.

``jnp.linalg.eigh``/``solve`` on batches of tiny matrices lower to
iterative per-matrix routines that crawl on TPU; the scan-to-map stage
calls them thousands of times per iteration.  These are the branch-free
analytic replacements (trigonometric symmetric 3×3 eigenvalues, cross
-product eigenvectors, Cramer solves) — pure VPU element-wise math that
vmaps/fuses freely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def solve3(A: Array, b: Array) -> Array:
    """Batched 3×3 solve via the adjugate.  A: (...,3,3), b: (...,3)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    x0 = c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2]
    x1 = c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2]
    x2 = c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]
    return jnp.stack([x0, x1, x2], -1) * inv_det[..., None]


def eigvals_sym3(A: Array) -> Array:
    """Eigenvalues of symmetric (...,3,3), ascending — the trigonometric
    (Smith) method, numerically safe for the near-degenerate covariance
    matrices line/plane tests produce."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-38))
    detB = (B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2]
                            - B[..., 1, 2] * B[..., 2, 1])
            - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2]
                              - B[..., 1, 2] * B[..., 2, 0])
            + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1]
                              - B[..., 1, 1] * B[..., 2, 0]))
    r = jnp.clip(detB / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l2 = q + 2.0 * p * jnp.cos(phi)                        # largest
    l0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)   # smallest
    l1 = 3.0 * q - l0 - l2
    return jnp.stack([l0, l1, l2], -1)


def principal_eigvec_sym3(A: Array, eigval: Array) -> Array:
    """Unit eigenvector of symmetric (...,3,3) for the given eigenvalue,
    via the column cross-product of (A − λI) (rank-2 ⇒ its null space is
    the eigendirection).  Picks the largest cross product of the three
    column pairs for stability."""
    M = A - eigval[..., None, None] * jnp.eye(3, dtype=A.dtype)
    c0, c1, c2 = M[..., :, 0], M[..., :, 1], M[..., :, 2]
    v01 = jnp.cross(c0, c1)
    v02 = jnp.cross(c0, c2)
    v12 = jnp.cross(c1, c2)
    n01 = jnp.sum(v01 * v01, -1)
    n02 = jnp.sum(v02 * v02, -1)
    n12 = jnp.sum(v12 * v12, -1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], -1), -1)
    v = jnp.take_along_axis(
        jnp.stack([v01, v02, v12], -2), best[..., None, None], -2
    )[..., 0, :]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, 1e-20)


def topk_small_min(d: Array, k: int) -> tuple[Array, Array]:
    """Iterated masked argmin top-k (ascending) over the last axis —
    beats ``lax.top_k``'s sort lowering for small k on TPU.

    Returns (values (...,k), indices (...,k))."""
    big = jnp.asarray(3e38, d.dtype)
    vals, idxs = [], []
    cur = d
    n = d.shape[-1]
    for _ in range(k):
        i = jnp.argmin(cur, axis=-1)
        v = jnp.take_along_axis(cur, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        cur = jnp.where(jnp.arange(n) == i[..., None], big, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)
