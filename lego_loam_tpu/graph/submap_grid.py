"""Incremental world-frame submap as a persistent voxel hash grid.

TPU-native replacement for the reference's per-cycle submap assembly
(``extractSurroundingKeyFrames`` + union voxel filters,
``mapOptmization.cpp:857-996``).  The reference re-concatenates and
re-downsamples ~50 keyframe clouds on EVERY mapping cycle (it caches the
transformed clouds, but not the union filter); profiled on TPU that
rebuild — two lexsorts + gathers + segment-sum scatters over 128 K points
— costs ~7.7 ms of the ~18 ms mapping step, all of it HBM-serialized
scatter/gather traffic.

Here the submap lives in mapping state as two fixed-capacity voxel hash
grids (corner / surf+outlier).  Each slot holds a world-frame RUNNING
CENTROID (coordinate sum + count) and the index of the last keyframe
that wrote it:

* **insert** (on keyframe creation only): scatter-ADD the new
  keyframe's ~3.5 K downsampled points into their hashed voxel slots —
  this is simultaneously the union voxel filter (points of one voxel
  average into one centroid, like pcl::VoxelGrid) and the
  sliding-window eviction (see below).  Cost: one ~3.5 K-index scatter
  ≈ 35 µs, amortized over the whole keyframe lifetime, vs 7.7 ms per
  mapping cycle.
* **read** (every mapping cycle): a slot is live iff its writer tag is
  among the latest ``surrounding_keyframe_search_num`` keyframes — the
  exact deque semantics of the reference's loop-closure-ON mode
  (``mapOptmization.cpp:863-913``, latest-50 window).  Slots whose
  writers slid out of the window go stale with zero work; re-visited
  surfaces are re-tagged by newer keyframes.
* **rebuild** (loop closure only): ``correctPoses``
  (``mapOptmization.cpp:1481-1511``) rewrites every keyframe pose, so the
  world-frame grid is re-scattered from the window keyframes under their
  corrected poses — a 128 K-point scatter, paid only on the rare closure
  event (the reference likewise clears its submap cache there, :1497).

Differences vs the reference, by design (validated by trajectory ATE):
a slot's centroid accumulates over the voxel's whole in-window-touched
lifetime (it resets only once its last writer leaves the window) rather
than over exactly the current window, and distinct voxels may collide
in the hash (slots are sized ≥ the reference's union-filter capacity,
so collision loss is a few percent — one of 5 NN neighbours
occasionally swaps, which the eigenvalue/plane gates absorb).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from ..core import se3
from ..core.config import LegoLoamConfig
from ..solve.scan2map import MapCloud
from .keyframes import (CORNER_CAP, OUTLIER_CAP, SURF_CAP, KeyframeClouds,
                        as_points)

Array = jax.Array


@struct.dataclass
class SubmapGrid:
    """Two voxel hash grids (~1 MB at VLP-16 capacities) — small enough
    to live in :class:`~lego_loam_tpu.pipeline.mapping.MappingMeta` and
    cross the run-mapping ``lax.cond`` every scan.

    Slots hold RUNNING CENTROIDS (coordinate sums + counts), not single
    representative points: scan-to-map fits lines/planes to these map
    points, and centroid averaging over a voxel's in-window hits is what
    the reference's pcl::VoxelGrid union filter provides — storing one
    raw point instead injects leaf-scale jitter into every fit."""

    corner_sum: Array    # (Sc, 3) world-frame coordinate sums
    corner_cnt: Array    # (Sc,) float32 hit counts
    corner_tag: Array    # (Sc,) int32 last-writer keyframe index, -1=empty
    surf_sum: Array      # (Ss, 3)
    surf_cnt: Array      # (Ss,)
    surf_tag: Array      # (Ss,)


def empty_grid(cfg: LegoLoamConfig) -> SubmapGrid:
    m = cfg.mapping
    return SubmapGrid(
        corner_sum=jnp.zeros((m.max_map_corner, 3), jnp.float32),
        corner_cnt=jnp.zeros((m.max_map_corner,), jnp.float32),
        corner_tag=jnp.full((m.max_map_corner,), -1, jnp.int32),
        surf_sum=jnp.zeros((m.max_map_surf, 3), jnp.float32),
        surf_cnt=jnp.zeros((m.max_map_surf,), jnp.float32),
        surf_tag=jnp.full((m.max_map_surf,), -1, jnp.int32))


def _slots(xyz: Array, valid: Array, leaf: float, n_slots: int) -> Array:
    """Spatial hash of each point's voxel cell into [0, n_slots); invalid
    points map to n_slots (scatter mode='drop')."""
    q = jnp.floor(xyz / leaf).astype(jnp.int32)
    h = (q[..., 0] * 73856093) ^ (q[..., 1] * 19349663) \
        ^ (q[..., 2] * 83492791)
    slot = (h & jnp.int32(2 ** 31 - 1)) % n_slots
    return jnp.where(valid, slot, n_slots)


def _scatter_add(grid_sum: Array, grid_cnt: Array, grid_tag: Array,
                 slot: Array, xyz: Array, valid: Array, tag: Array):
    """Accumulate points into slots; latest writer re-tags the slot."""
    new_sum = grid_sum.at[slot].add(
        jnp.where(valid[:, None], xyz, 0.0), mode="drop")
    new_cnt = grid_cnt.at[slot].add(valid.astype(jnp.float32),
                                    mode="drop")
    new_tag = grid_tag.at[slot].set(
        jnp.broadcast_to(tag, slot.shape), mode="drop")
    return new_sum, new_cnt, new_tag


def _zero_stale(grid: SubmapGrid, lo: Array) -> SubmapGrid:
    """Reset accumulators of slots whose writer fell out of the window —
    elementwise over the whole grid (cheap), so a re-touched voxel
    restarts its centroid instead of mixing epochs."""
    c_stale = (grid.corner_tag < lo)[:, None]
    s_stale = (grid.surf_tag < lo)[:, None]
    return grid.replace(
        corner_sum=jnp.where(c_stale, 0.0, grid.corner_sum),
        corner_cnt=jnp.where(c_stale[:, 0], 0.0, grid.corner_cnt),
        surf_sum=jnp.where(s_stale, 0.0, grid.surf_sum),
        surf_cnt=jnp.where(s_stale[:, 0], 0.0, grid.surf_cnt))


@functools.partial(jax.jit, static_argnames=("cfg", "window"))
def insert(grid: SubmapGrid, tag: Array, pose: Array,
           corner: Array, corner_valid: Array,
           surf: Array, surf_valid: Array,
           outlier: Array, outlier_valid: Array,
           cfg: LegoLoamConfig, window: int) -> SubmapGrid:
    """Accumulate one keyframe's sensor-frame clouds (already per-scan
    downsampled) into the grid under ``pose``.  ``tag`` is the keyframe's
    index.  Surf and outlier clouds share the surf grid, matching the
    reference's surf-map = surf + outlier union (:992-994)."""
    m = cfg.mapping
    grid = _zero_stale(grid, tag - window + 1)
    cw = se3.apply(pose, corner)
    sw = se3.apply(pose, surf)
    ow = se3.apply(pose, outlier)

    c_slot = _slots(cw, corner_valid, m.corner_leaf_size, m.max_map_corner)
    corner_sum, corner_cnt, corner_tag = _scatter_add(
        grid.corner_sum, grid.corner_cnt, grid.corner_tag, c_slot, cw,
        corner_valid, tag)

    s_xyz = jnp.concatenate([sw, ow], axis=0)
    s_ok = jnp.concatenate([surf_valid, outlier_valid], axis=0)
    s_slot = _slots(s_xyz, s_ok, m.surf_leaf_size, m.max_map_surf)
    surf_sum, surf_cnt, surf_tag = _scatter_add(
        grid.surf_sum, grid.surf_cnt, grid.surf_tag, s_slot, s_xyz,
        s_ok, tag)

    return SubmapGrid(corner_sum=corner_sum, corner_cnt=corner_cnt,
                      corner_tag=corner_tag, surf_sum=surf_sum,
                      surf_cnt=surf_cnt, surf_tag=surf_tag)


def maps(grid: SubmapGrid, kf_count: Array, window: int):
    """The live submap view (voxel centroids): slots written by the
    latest ``window`` keyframes (the reference's latest-50 deque,
    ``mapOptmization.cpp:863-913``)."""
    lo = kf_count - window
    corner_ok = ((grid.corner_tag >= lo) & (grid.corner_tag >= 0)
                 & (grid.corner_cnt > 0))
    surf_ok = ((grid.surf_tag >= lo) & (grid.surf_tag >= 0)
               & (grid.surf_cnt > 0))
    corner_xyz = grid.corner_sum / jnp.maximum(grid.corner_cnt, 1.0)[:, None]
    surf_xyz = grid.surf_sum / jnp.maximum(grid.surf_cnt, 1.0)[:, None]
    return (MapCloud(xyz=jnp.where(corner_ok[:, None], corner_xyz, 0.0),
                     valid=corner_ok),
            MapCloud(xyz=jnp.where(surf_ok[:, None], surf_xyz, 0.0),
                     valid=surf_ok))


@functools.partial(jax.jit, static_argnames=("cfg", "window"))
def rebuild(kf_pose: Array, kf_count: Array, clouds: KeyframeClouds,
            cfg: LegoLoamConfig, window: int) -> SubmapGrid:
    """Re-scatter the window keyframes from scratch — called after a loop
    closure rewrites the keyframe poses (``correctPoses``,
    ``mapOptmization.cpp:1481-1511``; the reference clears its
    transformed-cloud cache there, :1497).  Oldest keyframe first so the
    newest write wins each voxel, matching :func:`insert` order."""
    K = clouds.capacity
    sel = jnp.arange(window, dtype=jnp.int32) + (kf_count - window)
    in_range = (sel >= 0) & (sel < kf_count)
    sel_c = jnp.clip(sel, 0, K - 1)

    pose = kf_pose[sel_c]                                    # (W, 6)
    tag = jnp.where(in_range, sel_c, -1)

    def world(block, valid_block):
        pts = as_points(block[sel_c])                        # (W, C, 3)
        ok = valid_block[sel_c] & in_range[:, None]
        w = jax.vmap(se3.apply)(pose, pts)
        return (jnp.where(ok[:, :, None], w, 0.0).reshape(-1, 3),
                ok.reshape(-1))

    m = cfg.mapping
    cw, c_ok = world(clouds.corner, clouds.corner_valid)
    sw, s_ok = world(clouds.surf, clouds.surf_valid)
    ow, o_ok = world(clouds.outlier, clouds.outlier_valid)
    tag_c = jnp.repeat(tag, CORNER_CAP)
    tag_s = jnp.concatenate([jnp.repeat(tag, SURF_CAP),
                             jnp.repeat(tag, OUTLIER_CAP)])

    empty = empty_grid(cfg)
    c_slot = _slots(cw, c_ok, m.corner_leaf_size, m.max_map_corner)
    corner_sum, corner_cnt, corner_tag = _scatter_add(
        empty.corner_sum, empty.corner_cnt, empty.corner_tag,
        c_slot, cw, c_ok, tag_c)

    s_xyz = jnp.concatenate([sw, ow], axis=0)
    s_all_ok = jnp.concatenate([s_ok, o_ok], axis=0)
    s_slot = _slots(s_xyz, s_all_ok, m.surf_leaf_size, m.max_map_surf)
    surf_sum, surf_cnt, surf_tag = _scatter_add(
        empty.surf_sum, empty.surf_cnt, empty.surf_tag,
        s_slot, s_xyz, s_all_ok, tag_s)

    return SubmapGrid(corner_sum=corner_sum, corner_cnt=corner_cnt,
                      corner_tag=corner_tag, surf_sum=surf_sum,
                      surf_cnt=surf_cnt, surf_tag=surf_tag)
