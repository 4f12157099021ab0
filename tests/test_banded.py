"""Banded (per-ring-window) odometry search tests — `match/banded.py`.

The banded path reproduces the full-matrix correspondence semantics
(`featureAssociation.cpp:503-733`) restricted to ±B rings; with B wide
enough to cover every ring it must agree with the exact search, and at
the production B it must still recover a known sweep motion.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.core.types import FeatureCloud
from lego_loam_tpu.match import banded
from lego_loam_tpu.solve.odometry import two_step_odometry

V = 8  # rings in the miniature scene


def _cloud(xyz, ring, cap, blocked_cap=None):
    """Compact ring-ascending cloud (the position-major layout contract:
    valid entries sorted by ring, invalids last).  With ``blocked_cap``,
    lay out as (V, blocked_cap) ring blocks instead (the
    `frontend/features.py` less_flat layout that
    `banded.ring_block_from_layout` re-views for free)."""
    order = np.argsort(ring, kind="stable")
    xyz, ring = np.asarray(xyz, np.float32)[order], np.asarray(
        ring, np.float32)[order]
    if blocked_cap is None:
        n = xyz.shape[0]
        out = np.zeros((cap, 3), np.float32)
        rg = np.zeros((cap,), np.float32)
        vd = np.zeros((cap,), bool)
        out[:n], rg[:n], vd[:n] = xyz, ring, True
    else:
        out = np.zeros((V, blocked_cap, 3), np.float32)
        rg = np.zeros((V, blocked_cap), np.float32)
        vd = np.zeros((V, blocked_cap), bool)
        for r in range(V):
            sel = np.where(ring.astype(int) == r)[0][:blocked_cap]
            out[r, :len(sel)] = xyz[sel]
            rg[r, :len(sel)] = ring[sel]
            vd[r, :len(sel)] = True
        out, rg, vd = out.reshape(-1, 3), rg.reshape(-1), vd.reshape(-1)
    rt = np.ones(rg.shape, np.float32)
    return FeatureCloud(xyz=jnp.asarray(out), ring=jnp.asarray(rg),
                        rel_time=jnp.asarray(rt), valid=jnp.asarray(vd))


def test_ring_block_matches_numpy_oracle():
    """`ring_block` = per-ring stable compaction with capacity truncation."""
    rng = np.random.default_rng(1)
    n, cap = 64, 6
    ring = np.sort(rng.integers(0, V, n)).astype(np.float32)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    cloud = _cloud(xyz, ring, n + 8)
    blk = banded.ring_block(cloud, V, cap)
    x_s = np.asarray(cloud.xyz)
    r_s = np.asarray(cloud.ring)
    v_s = np.asarray(cloud.valid)
    for r in range(V):
        sel = np.where(v_s & (r_s.astype(int) == r))[0][:cap]
        got_v = np.asarray(blk.valid[r])
        assert got_v.sum() == len(sel)
        np.testing.assert_allclose(np.asarray(blk.xyz[r])[:len(sel)],
                                   x_s[sel])  # order preserved (tie-breaks)


def test_band_windows_and_validity():
    """Row v of `band` holds exactly rings v−B..v+B, edge rows clipped."""
    cap = 4
    xyz = np.zeros((V * cap, 3), np.float32)
    ring = np.repeat(np.arange(V), cap).astype(np.float32)
    xyz[:, 0] = ring  # x encodes the ring
    blk = banded.ring_block(_cloud(xyz, ring, V * cap), V, cap)
    B = 2
    bd = banded.band(blk, B)
    for v in range(V):
        rings_here = sorted(set(
            np.asarray(bd.xyz[v])[np.asarray(bd.valid[v]), 0].astype(int)))
        assert rings_here == list(range(max(0, v - B), min(V, v + B + 1)))


def _scene():
    """Plane + pole scene with per-ring counts UNDER the frontend's pick
    maxima (flat ≤ flat_per_sector·num_sectors = 24/ring, sharp ≤ 12/ring)
    — the invariant `ring_block`'s query capacity is sized to; exceeding
    it truncates queries and is out of contract."""
    rng = np.random.default_rng(0)
    gx, gy = np.meshgrid(np.linspace(2, 10, 12), np.linspace(-6, 6, 12))
    surf = np.stack([gx.ravel(), gy.ravel(),
                     np.full(gx.size, -0.8)], 1).astype(np.float32)
    surf_ring = np.tile(np.arange(V), surf.shape[0] // V)
    corners, cring = [], []
    for px, py in rng.uniform(-8, 8, (8, 2)):
        if abs(px) < 2 and abs(py) < 2:
            px += 4
        for r in range(V):
            corners.append([px, py, -0.5 + 0.25 * r])
            cring.append(r)
    return (surf, np.asarray(surf_ring, np.float32),
            np.asarray(corners, np.float32), np.asarray(cring, np.float32))


def _recover(band_rings):
    surf, surf_ring, corner, cring = _scene()
    cfg = vlp16()
    cfg = cfg.replace(
        laser=dataclasses.replace(cfg.laser, num_vertical_scans=V),
        feature=dataclasses.replace(cfg.feature, odom_band_rings=band_rings,
                                    max_less_flat=V * 64))
    f = cfg.feature
    # with banding on, EVERY cloud ships ring-blocked at capacity // V
    # per ring (the frontend's _blocked_from_picks layout; the solver
    # just reshapes)
    last_surf = _cloud(surf, surf_ring, None, blocked_cap=64)
    last_corner = _cloud(corner, cring, None,
                         blocked_cap=f.max_less_sharp // V)
    theta_true = jnp.asarray([0.01, -0.008, 0.03, 0.12, 0.05, 0.02],
                             jnp.float32)
    flat = _cloud(np.asarray(se3.apply_inverse(theta_true,
                                               jnp.asarray(surf))),
                  surf_ring, None, blocked_cap=f.max_flat // V)
    sharp = _cloud(np.asarray(se3.apply_inverse(theta_true,
                                                jnp.asarray(corner))),
                   cring, None, blocked_cap=f.max_sharp // V)
    theta = two_step_odometry(jnp.zeros(6, jnp.float32), sharp, flat,
                              last_corner, last_surf, cfg)
    return np.asarray(theta), np.asarray(theta_true)


def test_banded_recovers_known_motion_production_band():
    theta, theta_true = _recover(band_rings=4)
    err = np.abs(theta - theta_true)
    assert err[:3].max() < 0.01, err
    assert err[3:].max() < 0.03, err


def test_banded_wide_band_matches_exact_search():
    """B ≥ V−1 covers every candidate: banded and exact searches see the
    same correspondence set, so the solved motions must agree closely."""
    theta_wide, _ = _recover(band_rings=V - 1)
    theta_exact, _ = _recover(band_rings=0)
    np.testing.assert_allclose(theta_wide, theta_exact, atol=5e-3)
