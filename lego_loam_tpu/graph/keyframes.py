"""Keyframe store — fixed-capacity sharded-ready ring arrays.

Replaces the reference's dynamically grown keyframe structures
(``cloudKeyPoses3D/6D``, ``cornerCloudKeyFrames`` etc.,
``mapOptmization.cpp:1431-1474``) with preallocated (K, …) arrays + a
count, the layout both `lax.scan` replay and multi-device sharding need
(keyframes shard over the leading axis, SURVEY.md §5 long-context row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from ..core import se3
from ..core.config import LegoLoamConfig
from ..match.voxelhash import voxel_downsample
from ..solve.scan2map import MapCloud

Array = jax.Array

# per-keyframe cloud capacities (post voxel-downsample)
CORNER_CAP = 1024
SURF_CAP = 2048
OUTLIER_CAP = 512
SCAN2D_CAP = 512


@struct.dataclass
class KeyframeClouds:
    """The BIG per-keyframe cloud blocks (~170 MB at full capacity).

    Kept separate from the pose/stamp metadata so the pipeline can thread
    them through ``lax.scan`` as in-place row-scatter updates only — if
    they appear as ``lax.cond`` *outputs* (the reference-cadence "run
    mapping every 5th scan" branch), XLA materialises a full copy of every
    array on every scan (~100 MB × 2 a scan ≈ 1 ms of pure HBM traffic).
    As cond *operands* (read-only) they are free.

    Cloud blocks are stored ROW-FLATTENED (K, C*3): a (K, C, 3) device
    array gets its minor dim tile-padded 3→128 on TPU (42× HBM).  Use
    :func:`as_points` to view a gathered row as (…, C, 3)."""

    corner: Array        # (K, CORNER_CAP*3)  sensor frame
    corner_valid: Array  # (K, CORNER_CAP)
    surf: Array          # (K, SURF_CAP*3)    (surf + outlier separate)
    surf_valid: Array    # (K, SURF_CAP)
    outlier: Array       # (K, OUTLIER_CAP*3)
    outlier_valid: Array
    scan2d: Array        # (K, SCAN2D_CAP*3)  sensor frame (z≈chest)
    scan2d_valid: Array

    @property
    def capacity(self) -> int:
        return self.corner.shape[0]


@struct.dataclass
class KeyframeRow:
    """One keyframe's cloud payload + destination row (~67 KB) — the only
    cloud data that may cross a ``lax.cond`` boundary.  ``idx == capacity``
    means "write nothing" (scatter mode='drop')."""

    idx: Array           # () int32, == capacity ⇒ dropped
    corner: Array        # (CORNER_CAP*3,)
    corner_valid: Array
    surf: Array
    surf_valid: Array
    outlier: Array
    outlier_valid: Array
    scan2d: Array
    scan2d_valid: Array


@struct.dataclass
class KeyframeStore:
    """Pose/stamp metadata + a :class:`KeyframeClouds` — the read view the
    submap/loop/grid code consumes."""

    pose: Array          # (K, 6) map-frame keyframe poses
    stamp: Array         # (K,)
    count: Array         # ()  int32
    clouds: KeyframeClouds

    # field passthroughs so call sites read store.corner etc. directly
    @property
    def corner(self) -> Array:
        return self.clouds.corner

    @property
    def corner_valid(self) -> Array:
        return self.clouds.corner_valid

    @property
    def surf(self) -> Array:
        return self.clouds.surf

    @property
    def surf_valid(self) -> Array:
        return self.clouds.surf_valid

    @property
    def outlier(self) -> Array:
        return self.clouds.outlier

    @property
    def outlier_valid(self) -> Array:
        return self.clouds.outlier_valid

    @property
    def scan2d(self) -> Array:
        return self.clouds.scan2d

    @property
    def scan2d_valid(self) -> Array:
        return self.clouds.scan2d_valid

    @property
    def capacity(self) -> int:
        return self.pose.shape[0]


def as_points(flat: Array) -> Array:
    """(…, C*3) → (…, C, 3)."""
    return flat.reshape(flat.shape[:-1] + (-1, 3))


def as_flat(pts: Array) -> Array:
    """(…, C, 3) → (…, C*3)."""
    return pts.reshape(pts.shape[:-2] + (-1,))


def empty_clouds(cfg: LegoLoamConfig) -> KeyframeClouds:
    K = cfg.mapping.max_keyframes
    z = jnp.zeros
    return KeyframeClouds(
        corner=z((K, CORNER_CAP * 3), jnp.float32),
        corner_valid=z((K, CORNER_CAP), bool),
        surf=z((K, SURF_CAP * 3), jnp.float32),
        surf_valid=z((K, SURF_CAP), bool),
        outlier=z((K, OUTLIER_CAP * 3), jnp.float32),
        outlier_valid=z((K, OUTLIER_CAP), bool),
        scan2d=z((K, SCAN2D_CAP * 3), jnp.float32),
        scan2d_valid=z((K, SCAN2D_CAP), bool))


def empty_store(cfg: LegoLoamConfig) -> KeyframeStore:
    K = cfg.mapping.max_keyframes
    z = jnp.zeros
    return KeyframeStore(
        pose=z((K, 6), jnp.float32), stamp=z((K,), jnp.float32),
        count=jnp.int32(0), clouds=empty_clouds(cfg))


def make_row(idx: Array,
             corner: Array, corner_valid: Array,
             surf: Array, surf_valid: Array,
             outlier: Array, outlier_valid: Array,
             scan2d: Array, scan2d_valid: Array) -> KeyframeRow:
    """Pack one keyframe's clouds (each (C, 3)) into a scatter payload."""
    return KeyframeRow(
        idx=idx,
        corner=as_flat(corner), corner_valid=corner_valid,
        surf=as_flat(surf), surf_valid=surf_valid,
        outlier=as_flat(outlier), outlier_valid=outlier_valid,
        scan2d=as_flat(scan2d), scan2d_valid=scan2d_valid)


def null_row(capacity: int) -> KeyframeRow:
    """A row whose scatter is dropped (idx == capacity ⇒ out of bounds)."""
    z = jnp.zeros
    return KeyframeRow(
        idx=jnp.int32(capacity),
        corner=z((CORNER_CAP * 3,), jnp.float32),
        corner_valid=z((CORNER_CAP,), bool),
        surf=z((SURF_CAP * 3,), jnp.float32),
        surf_valid=z((SURF_CAP,), bool),
        outlier=z((OUTLIER_CAP * 3,), jnp.float32),
        outlier_valid=z((OUTLIER_CAP,), bool),
        scan2d=z((SCAN2D_CAP * 3,), jnp.float32),
        scan2d_valid=z((SCAN2D_CAP,), bool))


def apply_row(clouds: KeyframeClouds, row: KeyframeRow) -> KeyframeClouds:
    """UNCONDITIONAL row scatter (out-of-bounds idx drops) — this is the
    only way keyframe clouds are ever written, so the big arrays never
    cross a ``lax.cond`` output boundary (see :class:`KeyframeClouds`)."""
    s = lambda arr, val: arr.at[row.idx].set(val, mode="drop",
                                             unique_indices=True)
    return clouds.replace(
        corner=s(clouds.corner, row.corner),
        corner_valid=s(clouds.corner_valid, row.corner_valid),
        surf=s(clouds.surf, row.surf),
        surf_valid=s(clouds.surf_valid, row.surf_valid),
        outlier=s(clouds.outlier, row.outlier),
        outlier_valid=s(clouds.outlier_valid, row.outlier_valid),
        scan2d=s(clouds.scan2d, row.scan2d),
        scan2d_valid=s(clouds.scan2d_valid, row.scan2d_valid))


def insert_keyframe(store: KeyframeStore, pose: Array, stamp: Array,
                    corner: Array, corner_valid: Array,
                    surf: Array, surf_valid: Array,
                    outlier: Array, outlier_valid: Array,
                    scan2d: Array, scan2d_valid: Array) -> KeyframeStore:
    """Append at position ``count`` (no-op when full) — offline/test
    convenience; the pipeline uses :func:`make_row`/:func:`apply_row`."""
    ok = store.count < store.capacity
    idx = jnp.where(ok, store.count, store.capacity)
    row = make_row(idx, corner, corner_valid, surf, surf_valid,
                   outlier, outlier_valid, scan2d, scan2d_valid)
    return store.replace(
        pose=store.pose.at[idx].set(pose, mode="drop"),
        stamp=store.stamp.at[idx].set(stamp, mode="drop"),
        count=store.count + ok.astype(jnp.int32),
        clouds=apply_row(store.clouds, row))


def _transform_block(pose: Array, pts: Array, valid: Array):
    """Transform one keyframe's cloud block to world, masking invalid."""
    w = se3.apply(pose, pts)
    return jnp.where(valid[:, None], w, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg", "max_frames",
                                              "capacity"))
def assemble_global_map(store: KeyframeStore, center: Array,
                        cfg: LegoLoamConfig, max_frames: int = 512,
                        capacity: int = 131072):
    """World-frame global feature map for visualization/export — the
    ``publishGlobalMap`` path (``mapOptmization.cpp:633-693``): keyposes
    within ``global_map_visualization_search_radius`` (500 m) of
    ``center``, their corner+surf+outlier clouds transformed to world and
    voxel-downsampled at 0.4 m (:688).

    Returns (xyz (capacity, 3), valid (capacity,)).
    """
    from ..match.voxelhash import voxel_hash_downsample

    m = cfg.mapping
    K = store.capacity
    alive = jnp.arange(K) < store.count
    d = jnp.linalg.norm(store.pose[:, 3:] - center[3:], axis=-1)
    d = jnp.where(alive & (d <= m.global_map_visualization_search_radius),
                  d, jnp.inf)
    neg_top, sel = jax.lax.top_k(-d, max_frames)
    sel_ok = jnp.isfinite(-neg_top)

    pose = store.pose[sel]
    blocks = []
    valids = []
    for blk, vld in ((store.corner, store.corner_valid),
                     (store.surf, store.surf_valid),
                     (store.outlier, store.outlier_valid)):
        ok = vld[sel] & sel_ok[:, None]
        w = jax.vmap(se3.apply)(pose, as_points(blk[sel]))
        blocks.append(jnp.where(ok[:, :, None], w, 0.0).reshape(-1, 3))
        valids.append(ok.reshape(-1))
    xyz = jnp.concatenate(blocks, axis=0)
    ok = jnp.concatenate(valids, axis=0)
    out_xyz, _, out_ok = voxel_hash_downsample(
        xyz, jnp.zeros((xyz.shape[0], 0), xyz.dtype), ok,
        m.surf_leaf_size, capacity)
    return out_xyz, out_ok


@functools.partial(jax.jit, static_argnames=("cfg", "window", "with_sat"))
def assemble_submap(store: KeyframeStore, cur_pose: Array,
                    cfg: LegoLoamConfig, window: int = 50,
                    with_sat: bool = False):
    """Build the local corner/surf maps around the current pose.

    Merges the reference's two modes (``extractSurroundingKeyFrames``,
    ``mapOptmization.cpp:857-996``): the ``window`` nearest keyframes by
    keypose distance, gated by ``surrounding_keyframe_search_radius`` —
    equivalent to the latest-50 deque when driving forward and to the
    50 m radius search when revisiting.  Clouds are transformed to world,
    concatenated, and voxel-downsampled to fixed capacities (corner 0.2 m,
    surf(+outlier) 0.4 m, :988-995).

    Returns (corner_map: MapCloud, surf_map: MapCloud) — plus, with
    ``with_sat``, a () int32 count of voxels TRUNCATED by the
    ``max_map_corner``/``max_map_surf`` capacity cut.  These are
    WORLD-frame filters, where key-order truncation censors the map at
    an x-plane (see ``match/voxelhash.py``); the pipeline threads this
    into ``MappingMeta.map_sat`` so saturation is a counter + warning,
    not a silent accuracy bug.
    """
    m = cfg.mapping
    K = store.capacity
    alive = jnp.arange(K) < store.count
    d = jnp.linalg.norm(store.pose[:, 3:] - cur_pose[3:], axis=-1)
    d = jnp.where(alive, d, jnp.inf)
    in_radius = d <= m.surrounding_keyframe_search_radius
    neg_top, sel_idx = jax.lax.top_k(-jnp.where(in_radius, d, jnp.inf),
                                     window)
    sel_ok = jnp.isfinite(-neg_top)                      # (window,)

    sel_pose = store.pose[sel_idx]
    corner_valid = store.corner_valid[sel_idx] & sel_ok[:, None]
    corner_w = jax.vmap(_transform_block)(
        sel_pose, as_points(store.corner[sel_idx]), corner_valid)
    surf_valid = store.surf_valid[sel_idx] & sel_ok[:, None]
    surf_w = jax.vmap(_transform_block)(
        sel_pose, as_points(store.surf[sel_idx]), surf_valid)
    out_valid = store.outlier_valid[sel_idx] & sel_ok[:, None]
    out_w = jax.vmap(_transform_block)(
        sel_pose, as_points(store.outlier[sel_idx]), out_valid)

    corner_xyz, corner_ok, n_vox_c = voxel_downsample(
        corner_w.reshape(-1, 3), corner_valid.reshape(-1),
        m.corner_leaf_size, m.max_map_corner, with_count=True)
    surf_all = jnp.concatenate(
        [surf_w.reshape(-1, 3), out_w.reshape(-1, 3)], axis=0)
    surf_all_valid = jnp.concatenate(
        [surf_valid.reshape(-1), out_valid.reshape(-1)], axis=0)
    surf_xyz, surf_ok, n_vox_s = voxel_downsample(
        surf_all, surf_all_valid, m.surf_leaf_size, m.max_map_surf,
        with_count=True)

    maps = (MapCloud(xyz=corner_xyz, valid=corner_ok),
            MapCloud(xyz=surf_xyz, valid=surf_ok))
    if with_sat:
        sat = (jnp.maximum(n_vox_c - m.max_map_corner, 0)
               + jnp.maximum(n_vox_s - m.max_map_surf, 0))
        return maps + (sat,)
    return maps
