"""Distributed pose-graph optimization — factors sharded over the mesh.

The mandated scale-out path (SURVEY.md §2.1, §5): the reference's
iSAM2 graph is a single-threaded native library; here the factor set
shards over an ICI mesh axis and each Gauss-Newton/PCG iteration needs
exactly ONE ``psum`` per Hessian-vector product and one for the gradient —
poses stay replicated (6·K floats is tiny next to the factor blocks).
This is the Schur-free formulation: chain-preconditioned PCG over the
full normal equations (cyclic-reduction preconditioner replicated per
shard — ``graph.posegraph.chain_preconditioner``), with the reduction
riding the interconnect.

Built on `shard_map`; reuses the single-device kernels from
``graph.posegraph``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import se3
from ..graph.posegraph import (FactorGraph, _bmm_tn, _bmv, _bmv_t,
                               _chain_subdiag, _factor_blocks,
                               chain_preconditioner)

Array = jax.Array


def _pad_factors(g: FactorGraph, n_shards: int) -> FactorGraph:
    F = g.i.shape[0]
    pad = (-F) % n_shards
    if pad == 0:
        return g
    return g.replace(
        i=jnp.pad(g.i, (0, pad)),
        j=jnp.pad(g.j, (0, pad)),
        z=jnp.pad(g.z, ((0, pad), (0, 0))),
        weight=jnp.pad(g.weight, ((0, pad), (0, 0))),
        valid=jnp.pad(g.valid, (0, pad)))


def optimize_poses_sharded(poses: Array, node_count: Array,
                           g: FactorGraph, mesh: Mesh,
                           axis: str = "pgo", gn_iters: int = 8,
                           pcg_iters: int = 64,
                           return_iters: bool = False) -> Array:
    """Same result as ``posegraph.optimize_poses``, with the factor axis
    sharded over ``mesh[axis]`` and one psum per matvec.  With
    ``return_iters`` also returns the (gn_iters,) PCG iteration counts
    (replicated — every shard runs the same loop on psum'd scalars)."""
    K = poses.shape[0]
    n_shards = mesh.shape[axis]
    g = _pad_factors(g, n_shards)

    factor_spec = FactorGraph(
        i=P(axis), j=P(axis), z=P(axis), weight=P(axis), valid=P(axis),
        prior=P(), prior_weight=P())

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), factor_spec),
        out_specs=P(),
        check_vma=False)
    def run(poses, node_count, g_local):
        # HIGHEST matmul precision for the whole solve, same as
        # posegraph.optimize_poses: default TPU matmuls truncate inputs
        # to bf16, which NaNs the cyclic-reduction Schur complements and
        # floors the PCG residual above the relative exit tolerance.
        with jax.default_matmul_precision("highest"):
            return _run_body(poses, node_count, g_local)

    def _run_body(poses, node_count, g_local):
        alive = (jnp.arange(K) < node_count)[:, None]
        prior_w2 = g_local.prior_weight ** 2

        def gn_step(carry, _):
            poses = carry
            r, Ai, Aj = _factor_blocks(poses, g_local)

            grad = jnp.zeros((K, 6), poses.dtype)
            grad = grad.at[g_local.i].add(_bmv_t(Ai, r))
            grad = grad.at[g_local.j].add(_bmv_t(Aj, r))
            grad = jax.lax.psum(grad, axis)
            r0 = (poses[0] - g_local.prior) * jnp.sqrt(prior_w2)
            grad = grad.at[0].add(jnp.sqrt(prior_w2) * r0)

            Di = _bmm_tn(Ai, Ai)
            Dj = _bmm_tn(Aj, Aj)
            D = jnp.zeros((K, 6, 6), Ai.dtype)
            D = D.at[g_local.i].add(Di)
            D = D.at[g_local.j].add(Dj)
            D = jax.lax.psum(D, axis)
            D = D.at[0].add(jnp.diag(prior_w2)) + 1e-6 * jnp.eye(6)
            # chain sub-diagonal: local scatter over this shard's
            # factors, one psum — then the cyclic-reduction
            # preconditioner factors/solves REPLICATED on every shard
            # (poses are replicated; zero extra collectives per M⁻¹)
            subdiag = jax.lax.psum(
                _chain_subdiag(g_local, Ai, Aj, K), axis)
            M_inv = chain_preconditioner(g_local, Ai, Aj, D, node_count,
                                         K, subdiag=subdiag)

            def matvec(x):
                xi = x[g_local.i]
                xj = x[g_local.j]
                u = _bmv(Ai, xi) + _bmv(Aj, xj)
                y = jnp.zeros((K, 6), x.dtype)
                y = y.at[g_local.i].add(_bmv_t(Ai, u))
                y = y.at[g_local.j].add(_bmv_t(Aj, u))
                y = jax.lax.psum(y, axis)
                y = y.at[0].add(prior_w2 * x[0])
                return (y + 1e-8 * x) * alive

            b = -grad * alive
            x = jnp.zeros_like(b)
            res = b
            z = M_inv(res)
            p = z
            rz = jnp.sum(res * z)
            # RELATIVE exit, same rule as posegraph._pcg: the stiff
            # odometry weights (config.py odom_factor_weight 2e2/30) put
            # ‖b‖² at ~1e6+, so an absolute tolerance never fires and
            # every closure would burn pcg_iters psum-matvecs per GN
            # step through the live mesh path (mapping.py) — and the
            # sharded and single-device solves would converge
            # differently.  Equality + early-exit tested on a stiff
            # 400-node chain in tests/test_distributed.py.
            rtol = 1e-6
            rr0 = jnp.sum(b * b)

            def pcg_body(state):
                x, res, p, rz, it = state
                Ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
                x = x + alpha * p
                res = res - alpha * Ap
                zz = M_inv(res)
                rz_new = jnp.sum(res * zz)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                return x, res, zz + beta * p, rz_new, it + 1

            def pcg_cond(state):
                _, res, _, _, it = state
                return (it < pcg_iters) & \
                    (jnp.sum(res * res) > rtol * rtol * rr0)

            delta, _, _, _, it = jax.lax.while_loop(
                pcg_cond, pcg_body, (x, res, p, rz, jnp.int32(0)))
            upd = poses + delta * alive
            poses = jnp.where(alive, se3.normalize_angles(upd), upd)
            return poses, it

        poses, iters = jax.lax.scan(gn_step, poses, None,
                                    length=gn_iters)
        return poses, iters

    poses, iters = run(poses, node_count, g)
    return (poses, iters) if return_iters else poses
