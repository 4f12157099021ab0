"""Pose-graph optimization — the TPU-native iSAM2 replacement.

The reference hands keyframe poses to gtsam iSAM2 (PriorFactor +
BetweenFactor chain + loop BetweenFactors, ``mapOptmization.cpp:1335-1478``,
``:837-850``) and reads corrected poses back after loop closures
(``correctPoses`` :1481-1511).  Exactness target (SURVEY.md §7): match the
reference's *trajectory*, not iSAM2 internals — without loop factors the
chain's exact MAP solution is the composed odometry, so the solver only
needs to run when a loop factor exists.

Design: batched Gauss-Newton over all keyframe poses at once.
Per-factor 6-vector residuals and 6×6 Jacobian blocks are built with one
vmapped ``jacfwd`` (dense small blocks — MXU food), and the sparse normal
equations H δ = −g are solved matrix-free with block-Jacobi-preconditioned
conjugate gradient: the H·x product is two gathers + two 6×6 block matmuls
+ one scatter-add per factor set.  This formulation shards over the factor
axis with one `psum` per matvec — the distributed pose-graph path
(``distributed/sharded_pgo.py``) reuses these kernels inside `shard_map`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core import se3

Array = jax.Array


@struct.dataclass
class FactorGraph:
    """Fixed-capacity factor storage.

    Between factors i→j carry measurement z (6,) = pose of j in i's frame
    and a per-component weight (1/σ).  The odometry chain is factors
    (k−1→k); loop factors append at ``loop_count``.
    """
    i: Array          # (F,) int32
    j: Array          # (F,) int32
    z: Array          # (F, 6)
    weight: Array     # (F, 6)
    valid: Array      # (F,)
    prior: Array      # (6,) pose anchor for node 0
    prior_weight: Array  # (6,)


def empty_graph(capacity: int,
                odom_sigma_rot: float = 1e-3,
                odom_sigma_trans: float = 1e-2) -> FactorGraph:
    del odom_sigma_rot, odom_sigma_trans
    return FactorGraph(
        i=jnp.zeros((capacity,), jnp.int32),
        j=jnp.zeros((capacity,), jnp.int32),
        z=jnp.zeros((capacity, 6), jnp.float32),
        weight=jnp.zeros((capacity, 6), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        prior=jnp.zeros((6,), jnp.float32),
        prior_weight=jnp.full((6,), 1e3, jnp.float32))


def add_factor(g: FactorGraph, count: Array, i: Array, j: Array, z: Array,
               weight: Array):
    """Append one factor at slot ``count`` (no-op when full)."""
    cap = g.i.shape[0]
    slot = jnp.minimum(count, cap - 1)
    ok = count < cap
    sel = lambda new, old: jnp.where(ok, new, old)
    g = g.replace(
        i=g.i.at[slot].set(sel(i, g.i[slot])),
        j=g.j.at[slot].set(sel(j, g.j[slot])),
        z=g.z.at[slot].set(sel(z, g.z[slot])),
        weight=g.weight.at[slot].set(sel(weight, g.weight[slot])),
        valid=g.valid.at[slot].set(sel(True, g.valid[slot])))
    return g, count + ok.astype(count.dtype)


def between_residual(pi: Array, pj: Array, z: Array) -> Array:
    """Geometric between-factor error: [so3_log(Rz⁻¹ Ri⁻¹ Rj),
    Rz⁻¹(Ri⁻¹(t_j − t_i) − t_z)] — exact on the manifold even for the
    large errors a fresh loop closure introduces (Euler-difference
    residuals would not be)."""
    Ri = se3.rpy_to_matrix(pi[:3])
    Rj = se3.rpy_to_matrix(pj[:3])
    Rz = se3.rpy_to_matrix(z[:3])
    R_err = Rz.T @ (Ri.T @ Rj)
    t_rel = Ri.T @ (pj[3:] - pi[3:])
    t_err = Rz.T @ (t_rel - z[3:])
    return jnp.concatenate([se3.so3_log(R_err), t_err])


def _factor_blocks(poses: Array, g: FactorGraph):
    """Residuals + Jacobian blocks for every factor, batched.

    Returns (r (F,6), Ai (F,6,6) = ∂r/∂pose_i, Aj (F,6,6) = ∂r/∂pose_j),
    already weighted."""
    pi = poses[g.i]
    pj = poses[g.j]

    def one(pi_, pj_, z_, w_, v_):
        r = between_residual(pi_, pj_, z_)
        Ai = jax.jacfwd(lambda p: between_residual(p, pj_, z_))(pi_)
        Aj = jax.jacfwd(lambda p: between_residual(pi_, p, z_))(pj_)
        m = w_ * v_
        return r * m, Ai * m[:, None], Aj * m[:, None]

    return jax.vmap(one)(pi, pj, g.z, g.weight,
                         g.valid.astype(jnp.float32))


def _hvp(x: Array, g: FactorGraph, Ai: Array, Aj: Array,
         prior_w2: Array, K: int) -> Array:
    """H·x where H = Σ_f [Ai Aj]ᵀ[Ai Aj] + prior — matrix-free."""
    xi = x[g.i]                                    # (F,6)
    xj = x[g.j]
    u = jnp.einsum("fab,fb->fa", Ai, xi) + jnp.einsum("fab,fb->fa", Aj, xj)
    yi = jnp.einsum("fab,fa->fb", Ai, u)
    yj = jnp.einsum("fab,fa->fb", Aj, u)
    y = jnp.zeros((K, 6), x.dtype)
    y = y.at[g.i].add(yi)
    y = y.at[g.j].add(yj)
    y = y.at[0].add(prior_w2 * x[0])
    return y


def _block_diag(g: FactorGraph, Ai: Array, Aj: Array, prior_w2: Array,
                K: int) -> Array:
    """The K block-diagonal 6×6 of H (for the Jacobi preconditioner)."""
    Di = jnp.einsum("fab,fac->fbc", Ai, Ai)
    Dj = jnp.einsum("fab,fac->fbc", Aj, Aj)
    D = jnp.zeros((K, 6, 6), Ai.dtype)
    D = D.at[g.i].add(Di)
    D = D.at[g.j].add(Dj)
    D = D.at[0].add(jnp.diag(prior_w2))
    return D


def _pcg(matvec, b: Array, M_inv, iters: int, rtol: float = 1e-6):
    """Preconditioned conjugate gradient on flattened (K,6) vectors.

    Convergence on RELATIVE residual (‖r‖ ≤ rtol·‖b‖) — the stiff
    odometry weights put absolute gradient scales at ~1e6, so an absolute
    tolerance either never fires or fires instantly."""
    x = jnp.zeros_like(b)
    r = b
    z = M_inv(r)
    p = z
    rz = jnp.sum(r * z)
    rr0 = jnp.sum(b * b)

    def body(state):
        x, r, p, rz, it = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    def cond(state):
        _, r, _, _, it = state
        return (it < iters) & (jnp.sum(r * r) > rtol * rtol * rr0)

    x, *_ = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.int32(0)))
    return x


@functools.partial(jax.jit, static_argnames=("gn_iters", "pcg_iters"))
def optimize_poses(poses: Array, node_count: Array, g: FactorGraph,
                   gn_iters: int = 8, pcg_iters: int = 64) -> Array:
    """Batched GN over all poses.  Nodes ≥ ``node_count`` are frozen
    (their factor slots are invalid anyway).  Returns corrected (K,6)."""
    K = poses.shape[0]
    alive = (jnp.arange(K) < node_count)[:, None]
    prior_w2 = g.prior_weight ** 2

    def gn_step(carry, _):
        poses = carry
        r, Ai, Aj = _factor_blocks(poses, g)
        grad = jnp.zeros((K, 6), poses.dtype)
        grad = grad.at[g.i].add(jnp.einsum("fab,fa->fb", Ai, r))
        grad = grad.at[g.j].add(jnp.einsum("fab,fa->fb", Aj, r))
        r0 = (poses[0] - g.prior) * jnp.sqrt(prior_w2)
        grad = grad.at[0].add(jnp.sqrt(prior_w2) * r0)

        D = _block_diag(g, Ai, Aj, prior_w2, K)
        D = D + 1e-6 * jnp.eye(6)
        D_inv = jnp.linalg.inv(D)

        def matvec(x):
            return (_hvp(x, g, Ai, Aj, prior_w2, K)
                    + 1e-8 * x) * alive

        def M_inv(rv):
            return jnp.einsum("kab,kb->ka", D_inv, rv) * alive

        delta = _pcg(matvec, -grad * alive, M_inv, pcg_iters)
        upd = poses + delta * alive
        new_poses = jnp.where(alive, se3.normalize_angles(upd), upd)
        return new_poses, None

    poses, _ = jax.lax.scan(gn_step, poses, None, length=gn_iters)
    return poses
