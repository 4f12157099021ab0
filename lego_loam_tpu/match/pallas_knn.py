"""Pallas TPU kernel: fused distance + 5-NN selection in VMEM.

The scan-to-map association (``cornerOptimization``/``surfOptimization``,
``mapOptmization.cpp:1028-1197``) needs 5-NN of ~2 K corner / ~2 K surf
query points against 16 K / 32 K-slot map grids, EVERY Gauss-Newton
iteration.  Through XLA (``knn_chunked``: matmul + ``approx_min_k``) the
(Q, M) f32 distance matrix materializes in HBM — ~335 MB per iteration,
~4.2 ms of pure HBM traffic per mapping cycle, the single largest cost
in the pipeline.

This kernel never materializes the matrix: per 2048-candidate block it
computes the distance tile in VMEM (one small MXU matmul), packs each
entry into an int32 sort key ``quantized_distance << 15 | candidate_id``
(2 mm quantization to 131 m; ties resolve to the lower id,
deterministically), reduces 16-way group minima, and extracts the block's
top-5 keys; a final extraction over all block winners yields the global
top-5.  HBM traffic: queries + candidates + (Q, 8) keys ≈ 0.5 MB.

Selection is approximate in exactly one way: if two of the true top-5
fall in the same 16-candidate group of the same block, the second is
shadowed (probability ≲1 % per neighbourhood for hash-ordered candidate
slots — the same class as the recall-0.99 ``approx_min_k`` it replaces;
the reference's KD-tree is exact, and the eigen/plane-fit gates absorb a
rare 5th-neighbour swap).  Returned distances ARE exact: the winners'
squared distances are recomputed outside the kernel in f32.

STATUS — correct but not yet wired into the pipeline: on the axon v5e
the current form (16 statically-unrolled candidate blocks × 5
extraction passes) compiles for minutes through the remote Mosaic
helper and runs ~0.5 ms/call, LOSING to the fixed-precision
``knn_chunked`` (153 vs 225 scans/s end to end).  The win it targets
(never materializing the (Q, M) f32 distance matrix — ~335 MB/GN
iteration of HBM traffic) is real; the kernel needs a fori_loop body
with VMEM scratch accumulation instead of the unroll before it pays.
Kept with its oracle test (tests/test_pallas_knn.py) as the starting
point for that rework.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TQ = 256              # query tile rows
_CB = 2048             # candidate block
_GROUP = 16            # tournament group width
_IDX_BITS = 15         # candidate id bits (M <= 32768)
_D_SCALE = 500.0       # 2 mm quantization: 65535 / 131.072 m
_INTMAX = np.int32(2 ** 31 - 1)
_FAR = np.float32(1e9)           # coordinate sentinel for invalid slots
_INF = np.float32(3e38)


def _kernel(q_ref, c_ref, out_ref, *, n_blocks):
    # coordinates transposed outside to (3, N): per-axis rows broadcast
    # against query columns with no matmul — 9 VPU passes per block,
    # exact f32 at ANY world offset (difference before squaring; the
    # ‖a‖²+‖b‖²−2a·b form cancels catastrophically — see
    # bruteforce.pairwise_sqdist)
    qx = q_ref[0, :][:, None]                            # (TQ, 1)
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]

    tops = []
    for b in range(n_blocks):                            # static unroll
        cx = c_ref[0, pl.ds(b * _CB, _CB)][None, :]      # (1, CB)
        cy = c_ref[1, pl.ds(b * _CB, _CB)][None, :]
        cz = c_ref[2, pl.ds(b * _CB, _CB)][None, :]
        dx = qx - cx
        dy = qy - cy
        dz = qz - cz
        d2 = dx * dx + dy * dy + dz * dz                 # (TQ, CB)
        dq = jnp.minimum(jnp.sqrt(d2) * _D_SCALE, 65535.0)
        ids = jax.lax.broadcasted_iota(jnp.int32, (_TQ, _CB), 1) \
            + (b * _CB)
        key = (dq.astype(jnp.int32) << _IDX_BITS) | (ids & 0x7FFF)

        # 16-way tournament: STRIDED groups (lane g, g+128, g+256, …) —
        # pure lane slices + elementwise mins (Mosaic cannot reshape
        # lanes into sublanes); group membership statistics are the same
        gmin = key[:, 0:128]
        for i in range(1, _GROUP):
            gmin = jnp.minimum(gmin, key[:, i * 128:(i + 1) * 128])
        cols = []
        for _ in range(5):
            m5 = jnp.min(gmin, axis=1, keepdims=True)    # (TQ, 1)
            cols.append(m5)
            gmin = jnp.where(gmin == m5, _INTMAX, gmin)
        cols.append(jnp.full((_TQ, 3), _INTMAX, jnp.int32))
        tops.append(jnp.concatenate(cols, axis=1))       # (TQ, 8)

    all_keys = jnp.concatenate(tops, axis=1)             # (TQ, 8·nb)
    outs = []
    for _ in range(5):
        m5 = jnp.min(all_keys, axis=1, keepdims=True)
        outs.append(m5)
        all_keys = jnp.where(all_keys == m5, _INTMAX, all_keys)
    outs.append(jnp.full((_TQ, 3), _INTMAX, jnp.int32))
    out_ref[:] = jnp.concatenate(outs, axis=1)           # (TQ, 8)


@functools.partial(jax.jit, static_argnames=())
def _exact_d2(query: Array, cand: Array, idx: Array) -> Array:
    nb = cand[idx]                                       # (Q, 5, 3)
    d = nb - query[:, None, :]
    return jnp.sum(d * d, axis=-1)


def knn5_pallas(query: Array, query_valid: Array, cand: Array,
                cand_valid: Array):
    """5-NN with the same contract as ``bruteforce.knn_chunked(k=5)``:
    returns (idx (Q,5) int32, d2 (Q,5) f32 ascending, +inf rows for
    invalid queries).  Requires M % 2048 == 0, M <= 32768."""
    Q, M = query.shape[0], cand.shape[0]
    assert M % _CB == 0 and M <= (1 << _IDX_BITS), (Q, M)
    n_blocks = M // _CB

    qpad = (-Q) % _TQ
    q = jnp.pad(query, ((0, qpad), (0, 0))).T            # (3, Q+pad)
    c = jnp.where(cand_valid[:, None], cand, _FAR).T     # (3, M)

    keys = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks),
        grid=((Q + qpad) // _TQ,),
        in_specs=[
            pl.BlockSpec((3, _TQ), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TQ, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q + qpad, 8), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(q, c)[:Q, :5]

    idx = (keys & ((1 << _IDX_BITS) - 1)).astype(jnp.int32)
    d2 = _exact_d2(query, cand, idx)
    # quantization can reorder near-ties; restore ascending exact order
    order = jnp.argsort(d2, axis=1)
    d2 = jnp.take_along_axis(d2, order, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    d2 = jnp.where(query_valid[:, None], d2, _INF)
    # winners that were invalid slots carry FAR coords ⇒ huge exact d2 ✓
    return idx, d2


def knn5(query: Array, query_valid: Array, cand: Array, cand_valid: Array):
    """Dispatch: fused Pallas kernel on TPU, exact MXU brute force
    elsewhere (CPU tests)."""
    if (jax.default_backend() == "tpu" and cand.shape[0] % _CB == 0
            and cand.shape[0] <= (1 << _IDX_BITS)):
        return knn5_pallas(query, query_valid, cand, cand_valid)
    from .bruteforce import knn_chunked
    return knn_chunked(query, query_valid, cand, cand_valid, k=5)
