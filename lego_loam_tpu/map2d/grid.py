"""2D log-odds occupancy grid — the ``szyh_slam`` subsystem, TPU-style.

The reference accumulates keyframe-synchronized 2D virtual scans and
ray-traces them into a probability grid with Bresenham
(``probability_grid_map.cpp:36-53``), log-odds free −2 / occupied +3,
clamped to [0, 100], unknown 50, at 0.05 m resolution
(``probability_grid_map.h:17-23``, ``mapOptmization.cpp:602``).

Here each ray is sampled at one-cell granularity (vectorized DDA) and all
cell updates land in two scatter-adds — consecutive-duplicate cells along
a ray are masked so a cell is decremented at most once per ray, matching
Bresenham's visit-once property.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.config import LegoLoamConfig
from ..graph.keyframes import KeyframeStore, as_points

Array = jax.Array


def world_to_cell(xy: Array, origin: Array, resolution: float) -> Array:
    """(…,2) world coords → (…,2) int32 cell indices."""
    return jnp.floor((xy - origin) / resolution).astype(jnp.int32)


def _ray_cells(o_xy: Array, p_xy: Array, origin: Array,
               cfg: LegoLoamConfig):
    """Cells traversed from origin to endpoint (exclusive), one per step.

    Returns (cells (T,2) int32, valid (T,)) with duplicates masked.
    """
    g = cfg.grid2d
    T = g.max_ray_steps
    d = p_xy - o_xy
    dist = jnp.linalg.norm(d)
    n_steps = jnp.minimum(jnp.floor(dist / g.resolution).astype(jnp.int32),
                          T)
    t = (jnp.arange(T, dtype=jnp.float32) + 0.5) / jnp.maximum(
        dist / g.resolution, 1e-6)
    pts = o_xy[None, :] + jnp.clip(t, 0.0, 1.0)[:, None] * d[None, :]
    cells = world_to_cell(pts, origin, g.resolution)
    step_ok = jnp.arange(T) < n_steps
    # mask consecutive duplicates (visit-once along the ray)
    same = jnp.concatenate([
        jnp.zeros((1,), bool),
        jnp.all(cells[1:] == cells[:-1], axis=-1)])
    return cells, step_ok & ~same


@functools.partial(jax.jit, static_argnames="cfg")
def rasterize_scans(points_w: Array, points_valid: Array, origins_w: Array,
                    origin: Array, cfg: LegoLoamConfig) -> Array:
    """Accumulate rays into a log-odds grid.

    Args:
      points_w: (R, 3) world-frame scan endpoints (z ignored).
      points_valid: (R,)
      origins_w: (R, 3) per-ray sensor origin (world).
      origin: (2,) world coords of grid cell (0, 0).

    Returns (C, C) int32 grid in [clamp_min, clamp_max], unknown=50.
    """
    g = cfg.grid2d
    C = g.max_cells
    grid = jnp.full((C * C,), g.unknown, jnp.int32)

    def per_ray(p, o, ok):
        cells, cell_ok = _ray_cells(o[:2], p[:2], origin, cfg)
        cell_ok = cell_ok & ok
        in_grid = ((cells[:, 0] >= 0) & (cells[:, 0] < C)
                   & (cells[:, 1] >= 0) & (cells[:, 1] < C))
        flat = jnp.where(cell_ok & in_grid,
                         cells[:, 1] * C + cells[:, 0], C * C)
        end_cell = world_to_cell(p[:2], origin, g.resolution)
        end_in = ((end_cell[0] >= 0) & (end_cell[0] < C)
                  & (end_cell[1] >= 0) & (end_cell[1] < C) & ok)
        end_flat = jnp.where(end_in, end_cell[1] * C + end_cell[0], C * C)
        return flat, end_flat

    free_cells, occ_cells = jax.vmap(per_ray)(
        points_w, origins_w, points_valid)           # (R,T), (R,)

    delta = jnp.zeros((C * C,), jnp.int32)
    delta = delta.at[free_cells.reshape(-1)].add(
        g.log_odds_free, mode="drop")
    delta = delta.at[occ_cells].add(
        g.log_odds_occupied - g.log_odds_free, mode="drop")
    # endpoint cell: the free pass may also have hit it; the reference
    # applies free along the ray then occupied at the end — net +3 −(−2)
    # handled by the correction above only when the ray reached it; the
    # approximation is one log-odds quantum and does not affect the
    # 50-threshold classification.
    grid = jnp.clip(grid + delta, g.clamp_min, g.clamp_max)
    return grid.reshape(C, C)


@functools.partial(jax.jit, static_argnames=("cfg", "max_frames"))
def build_occupancy_grid(store: KeyframeStore, center: Array,
                         cfg: LegoLoamConfig, max_frames: int = 256,
                         origin: Array = None):
    """Grid from keyframes around ``center`` (the reference rebuilds
    from keyposes within the visualization radius,
    ``publishProbabilityGridMap``, ``mapOptmization.cpp:599-630``).

    Frame selection reproduces the reference's 1 m keypose voxel
    downsample (``publishGlobalMap`` :633-693): ONE representative
    keyframe per 1 m pose cell, so a many-times-revisited site (Stevens
    figure-eight) contributes its whole EXTENT, not ``max_frames``
    near-duplicates of the newest lap.

    ``origin``: world coords of grid cell (0, 0); defaults to centering
    the (static) ``max_cells`` square on ``center`` — pass the
    trajectory-bbox origin for full-coverage artifact grids
    (``eval/artifacts.py`` picks the matching ``max_cells`` bucket).

    Returns (grid (C, C) int32, origin (2,)).
    """
    g = cfg.grid2d
    K = store.capacity
    alive = jnp.arange(K) < store.count
    d = jnp.linalg.norm(store.pose[:, 3:5] - center[None, :2], axis=-1)
    elig = alive & (d <= cfg.mapping.global_map_visualization_search_radius)

    # one representative per 1 m pose voxel (newest wins, like the
    # reference's cache); then the max_frames nearest representatives
    leaf = cfg.mapping.surrounding_pose_leaf_size
    q = jnp.floor(store.pose[:, 3:5] / leaf).astype(jnp.int32)
    h = (q[:, 0] * 73856093) ^ (q[:, 1] * 19349663)
    S = 4 * max_frames
    slot = jnp.where(elig, (h & jnp.int32(2 ** 31 - 1)) % S, S)
    rep = jnp.full((S,), -1, jnp.int32).at[slot].max(
        jnp.arange(K, dtype=jnp.int32), mode="drop")
    rep_ok = rep >= 0
    rep_c = jnp.clip(rep, 0, K - 1)
    d_rep = jnp.where(rep_ok, d[rep_c], jnp.inf)
    neg_top, rsel = jax.lax.top_k(-d_rep, max_frames)
    sel = rep_c[rsel]
    sel_ok = jnp.isfinite(-neg_top)

    if origin is None:
        origin = center[:2] - 0.5 * g.max_cells * g.resolution

    poses = store.pose[sel]                          # (F, 6)
    pts = as_points(store.scan2d[sel])               # (F, S, 3)
    valid = store.scan2d_valid[sel] & sel_ok[:, None]
    world = jax.vmap(se3.apply)(poses, pts)          # (F, S, 3)
    origins = jnp.broadcast_to(poses[:, None, 3:6], world.shape)

    grid = rasterize_scans(world.reshape(-1, 3), valid.reshape(-1),
                           origins.reshape(-1, 3), origin, cfg)
    return grid, origin
