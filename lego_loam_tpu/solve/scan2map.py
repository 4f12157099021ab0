"""Stage 3a — scan-to-map refinement.

TPU-native reimplementation of ``MapOptimization::scan2MapOptimization``
(``mapOptmization.cpp:1315-1332``) and its per-iteration helpers
``cornerOptimization`` (:1028-1134), ``surfOptimization`` (:1136-1197),
``LMOptimization`` (:1199-1312):

* 5-NN against the assembled submap via chunked MXU distance blocks
  (replacing the per-point KD-tree queries);
* corner: 5-point covariance eigendecomposition; a neighbourhood is a line
  iff λ_max > 3 λ_mid; point-to-line residual against the ±0.1-scaled
  principal direction through the centroid (vector form — see
  solve/odometry.py for why the unsigned scalar is avoided);
* surf: 5-point plane fit ``A·n = −1``; reject if any neighbour deviates
  > 0.2 m; signed point-to-plane residual;
* weights 1−0.9·|d| (corner) and 1−0.9·|d|/⁴√‖p_local‖ (surf — the
  reference uses the *map-frame* norm at :1183, which grows with distance
  travelled; we use the sensor-frame norm, which is what the formula is
  for), keep > 0.1;
* full 6-DoF GN via ``jacfwd``, eigenvalue degeneracy guard at threshold
  100, ≤10 iterations, 0.05 deg / 0.05 cm convergence, ≥50 points.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.config import LegoLoamConfig
from ..core.linalg3 import eigvals_sym3, principal_eigvec_sym3, solve3
from ..match.bruteforce import knn_chunked

Array = jax.Array


class MapCloud(NamedTuple):
    """A fixed-capacity masked map point set."""
    xyz: Array     # (M, 3) world frame
    valid: Array   # (M,)


def _corner_assoc(pose: Array, pts: Array, pts_valid: Array,
                  corner_map: MapCloud, cfg: LegoLoamConfig):
    """Associate corner points with line-like 5-NN neighbourhoods.

    Returns (centroid (N,3), line dir u (N,3), weight (N,)) — constants
    for the subsequent GN iteration (``cornerOptimization``,
    ``mapOptmization.cpp:1028-1134``).
    """
    m = cfg.mapping
    world = se3.apply(pose, pts)
    idx, d2 = knn_chunked(world, pts_valid, corner_map.xyz,
                          corner_map.valid, k=5)
    near_ok = d2[:, 4] < m.neighbor_radius ** 2          # :1037

    nb = corner_map.xyz[idx]                             # (N,5,3)
    centroid = jnp.mean(nb, axis=1)
    d = nb - centroid[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", d, d) / 5.0
    evals = eigvals_sym3(cov)                            # ascending
    is_line = evals[:, 2] > m.corner_line_eig_ratio * evals[:, 1]
    u = principal_eigvec_sym3(cov, evals[:, 2])          # principal dir

    v = world - centroid
    r = v - jnp.sum(v * u, axis=-1, keepdims=True) * u
    dist = jnp.linalg.norm(r, axis=-1)
    w = 1.0 - 0.9 * dist                                 # :1129
    ok = pts_valid & near_ok & is_line & (w > 0.1)
    return centroid, u, jnp.where(ok, w, 0.0)


def _surf_assoc(pose: Array, pts: Array, pts_valid: Array,
                surf_map: MapCloud, cfg: LegoLoamConfig):
    """Associate surf points with planar 5-NN neighbourhoods.

    Returns (unit normal (N,3), offset (N,), weight (N,)) —
    (``surfOptimization``, ``mapOptmization.cpp:1136-1197``).
    """
    m = cfg.mapping
    world = se3.apply(pose, pts)
    idx, d2 = knn_chunked(world, pts_valid, surf_map.xyz,
                          surf_map.valid, k=5)
    near_ok = d2[:, 4] < m.neighbor_radius ** 2

    nb = surf_map.xyz[idx]                               # (N,5,3)
    # plane fit A·n = −1  (:1146-1153): 3×3 normal equations
    AtA = jnp.einsum("nki,nkj->nij", nb, nb)
    Atb = -jnp.sum(nb, axis=1)
    n = solve3(AtA + 1e-8 * jnp.eye(3), Atb)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n_unit = n / jnp.maximum(norm, 1e-12)
    pd = 1.0 / jnp.maximum(norm[..., 0], 1e-12)

    plane_dev = jnp.abs(jnp.einsum("nki,ni->nk", nb, n_unit)
                        + pd[:, None])
    plane_ok = jnp.all(plane_dev <= m.plane_fit_tolerance, axis=1)

    dist = jnp.einsum("ni,ni->n", world, n_unit) + pd    # signed
    local_rng = jnp.linalg.norm(pts, axis=-1)
    w = 1.0 - 0.9 * jnp.abs(dist) / jnp.sqrt(
        jnp.sqrt(jnp.maximum(local_rng, 1e-9)))          # :1180-1184
    ok = pts_valid & near_ok & plane_ok & (w > 0.1)
    return n_unit, pd, jnp.where(ok, w, 0.0)


@functools.partial(jax.jit, static_argnames="cfg")
def scan_to_map(pose0: Array, corner_pts: Array, corner_valid: Array,
                surf_pts: Array, surf_valid: Array,
                corner_map: MapCloud, surf_map: MapCloud,
                cfg: LegoLoamConfig) -> Array:
    """Refine the map-frame pose.  Skipped when the submap is too thin
    (corner ≤ 10 ∨ surf ≤ 100, ``mapOptmization.cpp:1316``)."""
    m = cfg.mapping
    enough = ((jnp.sum(corner_map.valid) > m.min_corner_map)
              & (jnp.sum(surf_map.valid) > m.min_surf_map))

    def body(state):
        pose, P, degenerate, it, _ = state

        # associate once per iteration (constants for the GN step, like the
        # reference's per-iteration KD searches, :1325-1327)
        centroid, u, wc = _corner_assoc(pose, corner_pts, corner_valid,
                                        corner_map, cfg)
        n_pl, pd, ws = _surf_assoc(pose, surf_pts, surf_valid,
                                   surf_map, cfg)
        n_sel = jnp.sum(wc > 0) + jnp.sum(ws > 0)

        def r_weighted(p):
            wc_ = jax.lax.stop_gradient(wc)
            ws_ = jax.lax.stop_gradient(ws)
            xc = se3.apply(p, corner_pts)
            v = xc - centroid
            rc = v - jnp.sum(v * u, axis=-1, keepdims=True) * u
            xs = se3.apply(p, surf_pts)
            rs = jnp.einsum("ni,ni->n", xs, n_pl) + pd
            return jnp.concatenate([
                rc.reshape(-1) * jnp.repeat(wc_, 3), rs * ws_])

        r = r_weighted(pose)
        J = jax.jacfwd(r_weighted)(pose)                  # (R, 6)
        H = J.T @ J
        g = J.T @ r
        Hd = H + 1e-4 * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        dx = -jnp.linalg.solve(Hd, g)

        def guard():
            evals, V = jnp.linalg.eigh(H)
            keep = evals >= m.degeneracy_eig_threshold    # :1274 (=100)
            V2 = V * keep[None, :]
            return (V2 @ V.T).astype(pose.dtype), ~jnp.all(keep)

        P, degenerate = jax.lax.cond(it == 0, guard,
                                     lambda: (P, degenerate))
        dx = jnp.where(degenerate, P @ dx, dx)
        dx = jnp.where(jnp.isnan(dx) | (n_sel < m.min_selected_points),
                       0.0, dx)
        pose = pose + dx

        d_rot = jnp.sqrt(jnp.sum(dx[:3] ** 2))
        d_tr = jnp.sqrt(jnp.sum(dx[3:] ** 2))
        converged = ((jnp.degrees(d_rot) < m.delta_r_converged_deg)
                     & (d_tr * 100.0 < m.delta_t_converged_cm))
        return pose, P, degenerate, it + 1, converged

    def cond(state):
        _, _, _, it, converged = state
        return (it < m.scan2map_iters) & ~converged

    def solve(p0):
        init = (p0, jnp.eye(6, dtype=p0.dtype), jnp.bool_(False),
                jnp.int32(0), jnp.bool_(False))
        pose, *_ = jax.lax.while_loop(cond, body, init)
        return pose

    return jax.lax.cond(enough, solve, lambda p: p, pose0)
