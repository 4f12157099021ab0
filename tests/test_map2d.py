"""2D occupancy grid tests against a Bresenham-style oracle."""

import numpy as np
import jax.numpy as jnp

from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.map2d.grid import rasterize_scans, world_to_cell

CFG = vlp16()
G = CFG.grid2d


def test_single_ray_free_and_occupied():
    origin = jnp.asarray([0.0, 0.0])
    o = np.array([[10.0, 10.0, 0.0]], np.float32)
    p = np.array([[10.0, 12.0, 0.0]], np.float32)    # 2 m ray (40 cells)
    grid = np.asarray(rasterize_scans(
        jnp.asarray(p), jnp.ones(1, bool), jnp.asarray(o),
        origin, CFG))
    cx = int(10.0 / G.resolution)
    # cells along the ray are decremented from unknown (50)
    ray_vals = grid[int(10.2 / G.resolution):int(11.8 / G.resolution), cx]
    assert (ray_vals == G.unknown + G.log_odds_free).all()
    # endpoint cell is incremented
    ey = int(12.0 / G.resolution)
    assert grid[ey, cx] >= G.unknown + G.log_odds_occupied
    # far-away cells untouched
    assert grid[0, 0] == G.unknown


def test_repeated_observation_clamps():
    origin = jnp.asarray([0.0, 0.0])
    o = np.tile(np.array([[5.0, 5.0, 0.0]], np.float32), (40, 1))
    p = np.tile(np.array([[5.0, 8.0, 0.0]], np.float32), (40, 1))
    grid = np.asarray(rasterize_scans(
        jnp.asarray(p), jnp.ones(40, bool), jnp.asarray(o),
        origin, CFG))
    cx = int(5.0 / G.resolution)
    ray_vals = grid[int(5.3 / G.resolution):int(7.7 / G.resolution), cx]
    assert (ray_vals == G.clamp_min).all()           # fully free
    ey = int(8.0 / G.resolution)
    assert grid[ey, cx] == G.clamp_max               # fully occupied


def test_invalid_rays_ignored():
    origin = jnp.asarray([0.0, 0.0])
    o = np.array([[5.0, 5.0, 0.0]], np.float32)
    p = np.array([[5.0, 9.0, 0.0]], np.float32)
    grid = np.asarray(rasterize_scans(
        jnp.asarray(p), jnp.zeros(1, bool), jnp.asarray(o),
        origin, CFG))
    assert (grid == G.unknown).all()


def test_out_of_grid_points_dropped():
    origin = jnp.asarray([0.0, 0.0])
    o = np.array([[5.0, 5.0, 0.0]], np.float32)
    p = np.array([[5000.0, 5.0, 0.0]], np.float32)   # far outside
    grid = np.asarray(rasterize_scans(
        jnp.asarray(p), jnp.ones(1, bool), jnp.asarray(o),
        origin, CFG))
    assert grid.shape == (G.max_cells, G.max_cells)
    # ray marches off the edge; no crash, free cells only inside
    assert (grid <= G.unknown).all()
