"""Stage 2a — curvature, occlusion masking, sector top-k feature selection.

Reimplements ``calculateSmoothness`` / ``markOccludedPoints`` /
``extractFeatures`` (``featureAssociation.cpp:200-383``) over the per-ring
compacted ``SegmentedCloud`` (V, S) arrays.

The reference's per-sector sort + sequential greedy pick (with ±5 neighbor
suppression that stops at column gaps > 10) is reproduced as a short
``fori_loop`` of masked argmax picks, vmapped over all (ring, sector) pairs
simultaneously — 20 sequential steps total instead of 96 sequential sorts.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from ..core.config import LegoLoamConfig
from ..core.types import FeatureCloud, FeatureSet, SegmentedCloud
from ..match.voxelhash import voxel_downsample_with_payload

Array = jax.Array

_BIG = np.float32(1e18)


def compute_curvature(seg: SegmentedCloud) -> Array:
    """Squared 10-neighbour range difference (``featureAssociation.cpp:
    200-223``): c_j = (Σ_{l=±1..5} r_{j+l} − 10 r_j)²  per ring row."""
    r = jnp.where(seg.valid, seg.rng, 0.0)
    acc = -10.0 * r
    for l in range(1, 6):
        acc = acc + jnp.roll(r, l, axis=1) + jnp.roll(r, -l, axis=1)
    return acc * acc


def occlusion_mask(seg: SegmentedCloud, cfg: LegoLoamConfig) -> Array:
    """Initial neighbor-picked mask (``markOccludedPoints``,
    ``featureAssociation.cpp:226-262``): occlusion boundaries (range jump
    > 0.3 m within 10 columns → 6 far-side points masked) plus isolated
    points (both neighbors differ > 2 % of range)."""
    f = cfg.feature
    r = seg.rng
    col = seg.col
    v = seg.valid

    d1 = r                                   # depth at j
    d2 = jnp.roll(r, -1, axis=1)             # depth at j+1
    col_diff = jnp.abs(jnp.roll(col, -1, axis=1) - col)
    pair_ok = v & jnp.roll(v, -1, axis=1) & (col_diff < f.occlusion_col_diff)

    far_is_left = pair_ok & (d1 - d2 > f.occlusion_range_jump)   # mask j-5..j
    far_is_right = pair_ok & (d2 - d1 > f.occlusion_range_jump)  # mask j+1..j+6

    picked = jnp.zeros_like(v)
    for l in range(0, 6):                 # flag at j masks positions j-5..j
        picked = picked | jnp.roll(far_is_left, -l, axis=1)
    for l in range(1, 7):                 # flag at j masks positions j+1..j+6
        picked = picked | jnp.roll(far_is_right, l, axis=1)

    prev_diff = jnp.abs(jnp.roll(r, 1, axis=1) - r)
    next_diff = jnp.abs(jnp.roll(r, -1, axis=1) - r)
    isolated = v & (prev_diff > 0.02 * r) & (next_diff > 0.02 * r)
    return (picked | isolated) & v


def _sector_bounds(count: Array, num_sectors: int, guard: int = 5):
    """Per-(ring, sector) inclusive index bounds [sp, ep], matching
    ``featureAssociation.cpp:274-281`` with the ±5 guard bands baked into
    startRingIndex/endRingIndex (``imageProjection.cpp:362,397``)."""
    start = jnp.full_like(count, guard - 1)          # local startRingIndex
    end = count - 1 - guard                          # local endRingIndex
    k = jnp.arange(num_sectors)
    sp = (start[:, None] * (num_sectors - k) + end[:, None] * k) // num_sectors
    ep = (start[:, None] * (num_sectors - 1 - k)
          + end[:, None] * (k + 1)) // num_sectors - 1
    return sp, ep


def _gap_prefix(col: Array, valid: Array, max_gap: int) -> Array:
    """Per-ring prefix count of column gaps > ``max_gap``.  The
    reference's ±5 suppression walk breaks at the first such gap
    (``featureAssociation.cpp:306-326``); with this prefix sum the break
    condition becomes simply ``badcum[p] == badcum[idx]``."""
    gap = jnp.abs(col - jnp.roll(col, 1, axis=1))
    bad = (gap > max_gap) | ~valid
    bad = bad.at[:, 0].set(False)
    return jnp.cumsum(bad.astype(jnp.int32), axis=1)


def _greedy_pick(score: Array, eligible0: Array, picked0: Array,
                 badcum: Array, n_picks: int, maximize: bool,
                 cfg: LegoLoamConfig):
    """Run ``n_picks`` rounds of (argbest over each ring×sector, mark,
    suppress ±5 neighbours up to the first column gap).  Returns
    (pick one-hots (n_picks, V, K, S) in rank order, picked)."""
    V, K, S = eligible0.shape
    pos = jnp.arange(S)

    def body(carry, _):
        picked, rank = carry
        elig = eligible0 & ~picked[:, None, :]
        s = jnp.where(elig, score[:, None, :], -_BIG if maximize else _BIG)
        idx = (jnp.argmax(s, axis=-1) if maximize
               else jnp.argmin(s, axis=-1))                    # (V,K)
        has = jnp.any(elig, axis=-1)                           # (V,K)

        bc_idx = jnp.take_along_axis(badcum, idx, axis=1)      # (V,K)
        near = jnp.abs(pos[None, None, :] - idx[:, :, None]) <= 5
        same_run = badcum[:, None, :] == bc_idx[:, :, None]
        sup = near & same_run & has[:, :, None]                # (V,K,S)
        one_hot = (pos[None, None, :] == idx[:, :, None]) & has[:, :, None]
        picked = picked | jnp.any(sup, axis=1)
        return (picked, rank + 1), (one_hot, idx, has)

    (picked, _), (onehots, idxs, have) = jax.lax.scan(
        body, (picked0, jnp.int32(0)), None, length=n_picks)
    # onehots (n_picks,V,K,S); idxs/have (n_picks,V,K)
    return onehots, idxs, have, picked


def _cloud_from_picks(seg: SegmentedCloud, idxs: Array, have: Array,
                      capacity: int) -> FeatureCloud:
    """Build a FeatureCloud by GATHERING the ~R·V·K pick indices that
    :func:`_greedy_pick` already computed — no 28.8 K-index scatter
    compaction needed (TPU scatters serialize per index; gathers of a
    couple thousand indices are ~free).

    idxs/have: (R, V, K) pick column + validity per (rank, ring, sector).
    """
    R, V, K = idxs.shape
    S = seg.rng.shape[1]
    ring = jnp.broadcast_to(
        jnp.arange(V, dtype=jnp.int32)[None, :, None], (R, V, K))
    flat = (ring * S + jnp.clip(idxs, 0, S - 1)).reshape(-1)
    ok = have.reshape(-1)

    # left-compact in flat-pixel order — bit-identical layout to a
    # position-major mask compaction (the trajectory is chaotically
    # sensitive even to candidate ORDER via kNN tie-breaks, so the
    # layout is pinned, not left to rank order)
    n = R * V * K
    key = jnp.where(ok, flat, jnp.int32(2 ** 30))
    order = jnp.argsort(key)
    flat, ok = flat[order], ok[order]

    xyz = seg.xyz.reshape(-1, 3)[flat]
    rel = seg.rel_time.reshape(-1)[flat]
    ring_f = (flat // S).astype(jnp.float32)

    if n >= capacity:                       # static truncation
        xyz, rel, ring_f, ok = (xyz[:capacity], rel[:capacity],
                                ring_f[:capacity], ok[:capacity])
    else:
        pad = capacity - n
        xyz = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)])
        rel = jnp.concatenate([rel, jnp.zeros((pad,), rel.dtype)])
        ring_f = jnp.concatenate([ring_f, jnp.zeros((pad,), ring_f.dtype)])
        ok = jnp.concatenate([ok, jnp.zeros((pad,), bool)])
    return FeatureCloud(
        xyz=jnp.where(ok[:, None], xyz, 0.0), ring=ring_f,
        rel_time=jnp.where(ok, rel, 0.0), valid=ok)


def _blocked_from_picks(seg: SegmentedCloud, idxs: Array, have: Array,
                        capacity: int) -> FeatureCloud:
    """Ring-BLOCKED variant of :func:`_cloud_from_picks` for the banded
    odometry search (``match/banded.py``): ring v's picks land in rows
    ``[v·cap, (v+1)·cap)`` with cap = capacity // V (= n_picks·sectors,
    the per-ring pick maximum, so nothing truncates).  Within a ring,
    picks are sorted by column position with invalids last — the same
    within-ring order as the position-major compact layout, keeping kNN
    tie-break order equivalent.  Built by pure per-ring argsort + gather
    (no cross-ring scatter/compaction at all)."""
    R, V, K = idxs.shape
    S = seg.rng.shape[1]
    cap = capacity // V
    assert cap == R * K, (capacity, V, R, K)

    idx_vr = jnp.swapaxes(idxs, 0, 1).reshape(V, R * K)     # (V, R*K)
    ok_vr = jnp.swapaxes(have, 0, 1).reshape(V, R * K)
    key = jnp.where(ok_vr, idx_vr, jnp.int32(2 ** 30))
    order = jnp.argsort(key, axis=1)
    idx_s = jnp.take_along_axis(idx_vr, order, axis=1)
    ok_s = jnp.take_along_axis(ok_vr, order, axis=1)

    rings = jax.lax.broadcasted_iota(jnp.int32, (V, R * K), 0)
    flat = (rings * S + jnp.clip(idx_s, 0, S - 1)).reshape(-1)
    ok = ok_s.reshape(-1)
    xyz = seg.xyz.reshape(-1, 3)[flat]
    rel = seg.rel_time.reshape(-1)[flat]
    return FeatureCloud(
        xyz=jnp.where(ok[:, None], xyz, 0.0),
        ring=rings.reshape(-1).astype(jnp.float32),
        rel_time=jnp.where(ok, rel, 0.0), valid=ok)


@functools.partial(jax.jit, static_argnames="cfg")
def extract_features(seg: SegmentedCloud, cfg: LegoLoamConfig) -> FeatureSet:
    """Full feature extraction (``extractFeatures``,
    ``featureAssociation.cpp:265-383``)."""
    f = cfg.feature
    V, S = seg.rng.shape
    K = f.num_sectors

    curv = compute_curvature(seg)
    picked0 = occlusion_mask(seg, cfg)
    badcum = _gap_prefix(seg.col, seg.valid, f.occlusion_col_diff)

    sp, ep = _sector_bounds(seg.count, K)             # (V,K)
    pos = jnp.arange(S)
    sector = ((pos[None, None, :] >= sp[:, :, None])
              & (pos[None, None, :] <= ep[:, :, None])
              & (sp < ep)[:, :, None])                # (V,K,S)
    base_ok = seg.valid[:, None, :] & sector

    # --- corner picks: top-20 curvature, non-ground, curv > edge_threshold
    corner_elig = (base_ok & ~seg.is_ground[:, None, :]
                   & (curv > f.edge_threshold)[:, None, :])
    corner_oh, corner_idx, corner_has, picked = _greedy_pick(
        curv, corner_elig, picked0, badcum, f.less_sharp_per_sector,
        maximize=True, cfg=cfg)
    less_sharp_mask = jnp.any(jnp.any(corner_oh, axis=2), axis=0)

    # --- flat picks: 4 smallest-curvature ground points, curv < threshold
    flat_elig = (base_ok & seg.is_ground[:, None, :]
                 & (curv < f.surf_threshold)[:, None, :])
    _, flat_idx, flat_has, picked = _greedy_pick(
        curv, flat_elig, picked, badcum, f.flat_per_sector,
        maximize=False, cfg=cfg)

    # --- less-flat: every in-sector point not labeled corner (:370-377)
    in_any_sector = jnp.any(sector, axis=1) & seg.valid
    less_flat_src = in_any_sector & ~less_sharp_mask

    rings = jax.lax.broadcasted_iota(jnp.int32, (V, S), 0)

    # per-ring 0.2 m voxel downsample of the less-flat scan (:379-382).
    # Exact sort-based centroids, deliberately: these points are both the
    # odometry plane candidates and (via AssociationOut) the keyframe
    # surf clouds, and pcl::VoxelGrid's noise-averaging centroids proved
    # load-bearing — one-scatter hash representatives (even two-probe,
    # even neighbour-pre-smoothed) cost 0.94 → 1.1-1.4 m ATE on the
    # 2000-scan Stevens stress.
    per_ring_cap = cfg.feature.max_less_flat // V

    def ring_ds(xyz, payload, valid):
        return voxel_downsample_with_payload(
            xyz, payload, valid, f.surf_leaf_size, per_ring_cap)

    payload = jnp.stack(
        [rings.astype(jnp.float32), seg.rel_time], axis=-1)   # (V,S,2)
    ds_xyz, ds_payload, ds_valid = jax.vmap(ring_ds)(
        seg.xyz, payload, less_flat_src)
    less_flat = FeatureCloud(
        xyz=ds_xyz.reshape(-1, 3),
        ring=ds_payload[..., 0].reshape(-1),
        rel_time=ds_payload[..., 1].reshape(-1),
        valid=ds_valid.reshape(-1))

    if f.odom_band_rings > 0:
        # banded odometry (match/banded.py): pick clouds ship ring-
        # blocked so the solver re-views them for free; requires the
        # capacities to be exactly V·picks·sectors (config invariant,
        # asserted in _blocked_from_picks)
        return FeatureSet(
            sharp=_blocked_from_picks(seg,
                                      corner_idx[:f.sharp_per_sector],
                                      corner_has[:f.sharp_per_sector],
                                      f.max_sharp),
            less_sharp=_blocked_from_picks(seg, corner_idx, corner_has,
                                           f.max_less_sharp),
            flat=_blocked_from_picks(seg, flat_idx, flat_has, f.max_flat),
            less_flat=less_flat)
    return FeatureSet(
        sharp=_cloud_from_picks(seg, corner_idx[:f.sharp_per_sector],
                                corner_has[:f.sharp_per_sector],
                                f.max_sharp),
        less_sharp=_cloud_from_picks(seg, corner_idx, corner_has,
                                     f.max_less_sharp),
        flat=_cloud_from_picks(seg, flat_idx, flat_has, f.max_flat),
        less_flat=less_flat)
