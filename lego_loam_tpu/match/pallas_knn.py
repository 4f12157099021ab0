"""Pallas TPU kernel: fused distance + 5-NN selection in VMEM.

The scan-to-map association (``cornerOptimization``/``surfOptimization``,
``mapOptmization.cpp:1028-1197``) needs 5-NN of ~1-2 K query points
against 16 K / 32 K-slot map grids, EVERY Gauss-Newton iteration.
Through XLA (``knn_chunked``: matmul + ``approx_min_k``) the (Q, M) f32
distance matrix materializes in HBM (~268 MB per iteration).

**Measured verdict (r2 A/B on the v5e, 200-scan full pipeline): the XLA
path WINS — 246 vs 172 scans/s end-to-end.**  This kernel avoids the
HBM matrix but computes every distance with per-axis broadcast
differences on the VPU (~200M vector ops per call); the XLA path does
the cross-term on the MXU (~0.05 ms) and the top-k in dedicated
hardware, and the big matrix streams at HBM bandwidth (~0.3 ms) — cheap
enough that compute placement, not traffic, decides.  The kernel is
kept as a correct, tested alternative (``MappingConfig.knn_impl =
"pallas"``); a future variant could put the distance compute itself on
the MXU inside the kernel (pad K 3→128; ~40× pad waste still beats the
VPU) — not pursued because approx_min_k already wins.

The kernel never materializes the matrix.  Grid = (query tiles ×
candidate blocks); for each 2048-candidate block it computes the
distance tile in VMEM with per-axis broadcast differences (exact f32 at
ANY world offset — difference before squaring; the ‖a‖²+‖b‖²−2a·b form
cancels catastrophically, see ``bruteforce.pairwise_sqdist``), packs
each entry into an int32 sort key ``quantized_distance << 15 |
candidate_id`` (2 mm quantization to 131 m; ties resolve to the lower
id, deterministically), reduces 16-way strided group minima, and merges
the block's top-5 into a running top-5 carried in VMEM scratch across
the block dimension of the grid.  HBM traffic: queries + candidates +
(Q, 8) keys ≈ 0.5 MB.

Selection is approximate in exactly one way: if two of the true top-5
fall in the same 16-lane tournament group of the same block, the second
is shadowed (≲1 % of neighbourhoods at M = 16-32 K for hash-ordered
candidate slots — the same class as the recall-0.99 ``approx_min_k``
it replaces; the reference's KD-tree is exact, and the eigen/plane-fit
gates absorb a rare 5th-neighbour swap).  The nearest neighbour is
never shadowed.  Returned distances ARE exact: the winners' squared
distances are recomputed outside the kernel, difference-first, in f32.
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
_GROUP = 16            # tournament group width (strided over lanes)
_IDX_BITS = 15         # candidate id bits (M <= 32768)
_D_SCALE = 500.0       # 2 mm quantization: 65535 / 131.072 m
_INTMAX = np.int32(2 ** 31 - 1)
_FAR = np.float32(1e9)           # coordinate sentinel for invalid slots
_INF = np.float32(3e38)


def _kernel(q_ref, c_ref, out_ref, run_ref):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        run_ref[:] = jnp.full((_TQ, 8), _INTMAX, jnp.int32)

    # q block is (TQ, 3): coordinate columns are natural sublane
    # slices (a (3, TQ) layout would need a lane->sublane transpose per
    # grid step - measured 1000x slower)
    qx = q_ref[:, 0:1]                                   # (TQ, 1)
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    cx = c_ref[0:1, :]                                   # (1, CB)
    cy = c_ref[1:2, :]
    cz = c_ref[2:3, :]
    dx = qx - cx
    dy = qy - cy
    dz = qz - cz
    d2 = dx * dx + dy * dy + dz * dz                     # (TQ, CB)
    dq = jnp.minimum(jnp.sqrt(d2) * _D_SCALE, 65535.0)
    ids = jax.lax.broadcasted_iota(jnp.int32, (_TQ, _CB), 1) + j * _CB
    key = (dq.astype(jnp.int32) << _IDX_BITS) | (ids & 0x7FFF)

    gmin = key[:, 0:128]
    for i in range(1, _GROUP):
        gmin = jnp.minimum(gmin, key[:, i * 128:(i + 1) * 128])

    # merge block's top-5 (extracted from the group minima) with the
    # running top-5: 5 rounds of min over both pools
    run = run_ref[:]                                     # (TQ, 8)
    outs = []
    for _ in range(5):
        m_b = jnp.min(gmin, axis=1, keepdims=True)       # (TQ, 1)
        m_r = jnp.min(run, axis=1, keepdims=True)
        m = jnp.minimum(m_b, m_r)
        outs.append(m)
        gmin = jnp.where(gmin == m, _INTMAX, gmin)
        run = jnp.where(run == m, _INTMAX, run)
    new_run = jnp.concatenate(
        outs + [jnp.full((_TQ, 3), _INTMAX, jnp.int32)], axis=1)
    run_ref[:] = new_run

    @pl.when(j == nb - 1)
    def _():
        out_ref[:] = new_run


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
    q = jnp.pad(query, ((0, qpad), (0, 0)))              # (Q+pad, 3)
    c = jnp.where(cand_valid[:, None], cand, _FAR).T     # (3, M)

    keys = pl.pallas_call(
        _kernel,
        grid=((Q + qpad) // _TQ, n_blocks),
        in_specs=[
            pl.BlockSpec((_TQ, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _CB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TQ, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q + qpad, 8), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_TQ, 8), jnp.int32)],
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


def knn5(query: Array, query_valid: Array, cand: Array, cand_valid: Array,
         impl: str = None):
    """Dispatch by ``impl`` (or env ``LEGO_KNN_IMPL``; default "xla" —
    the measured-faster path, see module docstring).  "pallas" uses the
    fused kernel when the shapes fit; CPU always takes the XLA path."""
    import os
    if impl is None:
        impl = os.environ.get("LEGO_KNN_IMPL", "xla")
    if (impl == "pallas" and jax.default_backend() == "tpu"
            and cand.shape[0] % _CB == 0
            and cand.shape[0] <= (1 << _IDX_BITS)):
        return knn5_pallas(query, query_valid, cand, cand_valid)
    from .bruteforce import knn_chunked
    return knn_chunked(query, query_valid, cand, cand_valid, k=5)
