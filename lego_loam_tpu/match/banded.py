"""Banded (per-ring-window) correspondence search for scan-to-scan odometry.

The full-matrix search (``match/bruteforce.py``) scores every query
against every candidate: at HDL-64 the (Q, M) matrices are (1536, 16384)
surf / (768, 8192) corner — quadratic in beam count, because the feature
caps scale with V on BOTH axes (the superlinear term named by
``KITTI64_r04.json``).  But the reference's own correspondence semantics
are ring-local: the 2nd/3rd plane points and the 2nd line point must lie
within ±2.5 rings of the 1-NN's ring (``featureAssociation.cpp:520-565,
656-725``), and the 1-NN of a query is — geometrically — within a couple
of rings of the query's own beam.  So the search only ever needs a
*band* of rings around each query.

Layout: queries and candidates are re-blocked **per ring** into
``(V, cap, …)`` tensors (one packed scatter each, ~Q indices); the
candidate band for ring v is the static concatenation of rings
``v−B … v+B`` (2B+1 shifted views — rolls, no gathers).  The distance
work drops from ``Q·M`` to ``Q·(2B+1)·cc`` — ~10× at HDL-64 with B=4 —
while staying one batched MXU matmul.

Approximation vs the full search (documented, config-gated via
``FeatureConfig.odom_band_rings``; 0 = exact full matrix): a true 1-NN
more than B rings from the query's own ring is missed.  At B=4 that
requires the nearest feature to sit ≥4 beams away vertically while
being nearer than anything in the 9 surrounding rings — in practice a
sub-permille of picks.  The absolute 5 m gates here are *exact*
(difference-first recompute on the winners), which the full-matrix path
only approximates through the recentered expansion.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from flax import struct

from ..core.types import FeatureCloud

Array = jax.Array

_INF = np.float32(3e38)


@struct.dataclass
class RingBlocked:
    """A FeatureCloud re-laid-out as (V, cap) per-ring blocks."""

    xyz: Array        # (V, cap, 3)
    ring: Array       # (V, cap) float32 (original fractional ring)
    rel_time: Array   # (V, cap)
    valid: Array      # (V, cap) bool

    def as_cloud(self) -> FeatureCloud:
        """Flattened view usable anywhere a FeatureCloud is."""
        V, C = self.valid.shape
        return FeatureCloud(
            xyz=self.xyz.reshape(V * C, 3), ring=self.ring.reshape(-1),
            rel_time=self.rel_time.reshape(-1),
            valid=self.valid.reshape(-1))


@struct.dataclass
class BandedCandidates:
    """Candidate band tensors: row v holds rings v−B … v+B stacked."""

    xyz: Array        # (V, W*cap, 3)
    ring: Array       # (V, W*cap)
    valid: Array      # (V, W*cap)


def ring_block(cloud: FeatureCloud, num_rings: int, cap: int,
               presorted: bool = True) -> RingBlocked:
    """Scatter a compact FeatureCloud into per-ring blocks.

    One packed (xyz, ring, rel_time) scatter of N indices; points beyond
    ``cap`` in a ring are dropped (caps are sized to the per-ring pick
    maxima, so only pathological inputs truncate).

    ``presorted``: the pick clouds are ring-sorted by the position-major
    layout contract (``tests/test_features.py::
    test_feature_cloud_layout_invariants`` — valid entries ascending in
    (ring, col), invalids last), so the rank-within-ring comes from one
    ``searchsorted`` with no sort.  Pass False for arbitrary layouts to
    pay one small stable sort instead.  Either way, order within a ring
    preserves array position, keeping kNN tie-break order pinned.
    """
    N = cloud.valid.shape[0]
    ring_i = jnp.clip(jnp.floor(cloud.ring).astype(jnp.int32), 0,
                      num_rings - 1)
    seg = jnp.where(cloud.valid, ring_i, num_rings)
    if presorted:
        order = jnp.arange(N)
        seg_s = seg
    else:
        order = jnp.argsort(seg * (N + 1) + jnp.arange(N))
        seg_s = seg[order]
    # run starts by comparison-count, NOT jnp.searchsorted: one (V+1, N)
    # boolean reduce (trivial at these sizes) with a plain lowering
    start = jnp.sum(seg_s[None, :] < jnp.arange(num_rings + 1)[:, None],
                    axis=1, dtype=jnp.int32)
    # GATHER-based re-blocking (no scatter): slot (r, k) reads row
    # start[r]+k of the ring-sorted cloud, valid while it stays inside
    # ring r's run.  Gathers are cheaper than scatters on TPU (~10 ns
    # per index either way, but no serialization hazard), and the
    # scatter formulation here triggered a hardware kernel fault inside
    # the full-pipeline program at HDL-64 shapes (reproduced r5).
    src = start[:num_rings, None] + jnp.arange(cap)[None, :]  # (V, cap)
    in_run = src < start[1:, None]
    src_flat = jnp.clip(src.reshape(-1), 0, N - 1)

    packed = jnp.concatenate(
        [cloud.xyz, cloud.ring[:, None], cloud.rel_time[:, None],
         cloud.valid[:, None].astype(jnp.float32)], axis=1)[order]
    out = packed[src_flat]
    valid = in_run & (out[:, 5] > 0.5).reshape(num_rings, cap)
    return RingBlocked(
        xyz=out[:, :3].reshape(num_rings, cap, 3),
        ring=out[:, 3].reshape(num_rings, cap),
        rel_time=out[:, 4].reshape(num_rings, cap),
        valid=valid)


def ring_block_from_layout(cloud: FeatureCloud, num_rings: int
                           ) -> RingBlocked:
    """Zero-cost re-view of a cloud whose layout is ALREADY per-ring
    blocked with a fixed per-ring capacity (``frontend/features.py``
    builds less_flat exactly so: (V, max_less_flat//V) vmapped
    downsample, flattened row-major)."""
    V = num_rings
    cap = cloud.valid.shape[0] // V
    return RingBlocked(
        xyz=cloud.xyz.reshape(V, cap, 3),
        ring=cloud.ring.reshape(V, cap),
        rel_time=cloud.rel_time.reshape(V, cap),
        valid=cloud.valid.reshape(V, cap))


def band(blocked: RingBlocked, half_width: int) -> BandedCandidates:
    """Stack rings v−B … v+B into each row's candidate band.

    Pure rolls (two slices + concat each) — no gather indices."""
    V = blocked.valid.shape[0]
    v = jnp.arange(V)
    xs, rs, ok = [], [], []
    for o in range(-half_width, half_width + 1):
        in_range = ((v + o >= 0) & (v + o < V))[:, None]
        xs.append(jnp.roll(blocked.xyz, -o, axis=0))
        rs.append(jnp.roll(blocked.ring, -o, axis=0))
        ok.append(jnp.roll(blocked.valid, -o, axis=0) & in_range)
    return BandedCandidates(
        xyz=jnp.concatenate(xs, axis=1),
        ring=jnp.concatenate(rs, axis=1),
        valid=jnp.concatenate(ok, axis=1))


def banded_sqdist(qxyz: Array, center: Array,
                  cand: BandedCandidates) -> Array:
    """(V, qc, 3) × (V, Wc, 3) → (V, qc, Wc) squared distances.

    DIFFERENCE-FIRST (exact f32 on the VPU), not the ``‖a‖²+‖b‖²−2a·b``
    MXU expansion: banding already cut the matrix ~V/(2B+1)×, so the
    remaining Q·Wc·3 elementwise work is tiny, and difference-first
    sidesteps the bf16-truncation recentering dance entirely
    (``bruteforce.pairwise_sqdist`` documents those numbers).  It also
    avoids a batched HIGH-precision ``dot_general`` that faults the TPU
    inside the full-pipeline program at HDL-64 shapes (hardware kernel
    crash, reproduced r5; standalone the same op is fine).  ``center``
    is kept for API compatibility but unused.
    """
    del center
    d = qxyz[:, :, None, :] - cand.xyz[:, None, :, :]
    return jnp.sum(d * d, axis=-1)


def exact_sqdist_to(qxyz: Array, picked_xyz: Array) -> Array:
    """Difference-first exact distances query↔winner (the absolute-gate
    recompute mandated by the TPU numerics rules)."""
    d = qxyz - picked_xyz
    return jnp.sum(d * d, axis=-1)


def masked_argmin(d2: Array, ok: Array):
    """Batched masked argmin over the band axis.

    d2 (V, qc, Wc), ok (V, 1|qc, Wc) → (idx (V, qc) int32, d2min)."""
    d2m = jnp.where(ok, d2, _INF)
    idx = jnp.argmin(d2m, axis=-1).astype(jnp.int32)
    dmin = jnp.take_along_axis(d2m, idx[..., None], axis=-1)[..., 0]
    return idx, dmin


def gather_band(cand: BandedCandidates, idx: Array):
    """xyz rows of the band picked per query: (V, qc) → (V, qc, 3)."""
    return jnp.take_along_axis(cand.xyz, idx[..., None], axis=1)
