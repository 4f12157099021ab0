"""Stage 3a — scan-to-map refinement.

TPU-native reimplementation of ``MapOptimization::scan2MapOptimization``
(``mapOptmization.cpp:1315-1332``) and its per-iteration helpers
``cornerOptimization`` (:1028-1134), ``surfOptimization`` (:1136-1197),
``LMOptimization`` (:1199-1312):

* 5-NN against the assembled submap replacing the per-point KD-tree
  queries — backend selected by ``MappingConfig.knn_impl``: "xla"
  (default; MXU distance matrix + hardware ``approx_min_k`` — measured
  fastest, see ``match/pallas_knn.py`` docstring) or "pallas" (fused
  VMEM kernel);
* corner: 5-point covariance eigendecomposition; a neighbourhood is a line
  iff λ_max > 3 λ_mid; point-to-line residual against the ±0.1-scaled
  principal direction through the centroid (vector form — see
  solve/odometry.py for why the unsigned scalar is avoided);
* surf: 5-point plane fit (centred-covariance smallest eigenvector —
  better conditioned than the reference's ``A·n = −1`` on raw world
  coords, see ``_surf_assoc``); reject if any neighbour deviates
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
from ..core.linalg3 import eigvals_sym3, principal_eigvec_sym3
from ..match.pallas_knn import knn5

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
    idx, d2 = knn5(world, pts_valid, corner_map.xyz, corner_map.valid,
                   impl=m.knn_impl)

    nb = corner_map.xyz[idx]                             # (N,5,3)
    # gate on EXACT distances recomputed from the gathered points
    # (difference-first; the selection matrix runs at Precision.HIGH,
    # ~0.1 m² jitter, fine for ranking but not for a 1 m² gate)
    d2_exact = jnp.sum((nb - world[:, None, :]) ** 2, axis=-1)
    invalid5 = d2[:, 4] >= 1e30                          # <5 candidates
    near_ok = (jnp.max(d2_exact, axis=1) < m.neighbor_radius ** 2) \
        & ~invalid5                                      # :1037
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
    idx, d2 = knn5(world, pts_valid, surf_map.xyz, surf_map.valid,
                   impl=m.knn_impl)

    nb = surf_map.xyz[idx]                               # (N,5,3)
    # exact-gate as in _corner_assoc
    d2_exact = jnp.sum((nb - world[:, None, :]) ** 2, axis=-1)
    invalid5 = d2[:, 4] >= 1e30
    near_ok = (jnp.max(d2_exact, axis=1) < m.neighbor_radius ** 2) \
        & ~invalid5
    # Plane fit: centred covariance, normal = smallest eigenvector.  The
    # reference solves A·n = −1 on RAW map coordinates (:1146-1153),
    # whose normal equations condition as (‖p‖/spread)² — in f32 the
    # normal estimate visibly degrades hundreds of metres from the
    # origin.  The centred eigen-fit is the same plane, exactly
    # conditioned at any offset (difference-first), reusing the
    # closed-form 3×3 eig the corner path already uses.
    centroid = jnp.mean(nb, axis=1)
    dnb = nb - centroid[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", dnb, dnb) / 5.0
    evals = eigvals_sym3(cov)
    n_unit = principal_eigvec_sym3(cov, evals[:, 0])     # smallest
    pd = -jnp.einsum("ni,ni->n", n_unit, centroid)

    plane_dev = jnp.abs(jnp.einsum("nki,ni->nk", dnb, n_unit))
    plane_ok = jnp.all(plane_dev <= m.plane_fit_tolerance, axis=1)

    dist = jnp.einsum("ni,ni->n", world - centroid, n_unit)  # signed
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

    def assoc(pose):
        centroid, u, wc = _corner_assoc(pose, corner_pts, corner_valid,
                                        corner_map, cfg)
        n_pl, pd, ws = _surf_assoc(pose, surf_pts, surf_valid,
                                   surf_map, cfg)
        return centroid, u, wc, n_pl, pd, ws

    def body(state):
        pose, P, degenerate, it, _, A = state

        # Associate every ``scan2map_reassoc_every`` iterations (constants
        # for the GN steps in between).  The reference re-runs its KD
        # searches every iteration (:1325-1327) — equivalent to =1 here —
        # but late-iteration pose deltas are below the convergence
        # thresholds (0.05 deg / 0.05 cm), so the 5-NN sets don't change;
        # the dominant kNN matmuls are the single biggest op in the whole
        # pipeline (~20% of device time at =1).
        if m.scan2map_reassoc_every > 1:
            fresh = it % m.scan2map_reassoc_every == 0
            A = jax.lax.cond(fresh, lambda: assoc(pose), lambda: A)
        else:
            fresh = jnp.bool_(True)
            A = assoc(pose)
        centroid, u, wc, n_pl, pd, ws = A
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
        # Convergence may only be declared on an iteration that ran a
        # fresh association: a small dx on a frozen-correspondence
        # iteration can mean "stale constraints", not "converged"
        # (the reference re-searches every iteration, :1325-1327).
        converged = ((jnp.degrees(d_rot) < m.delta_r_converged_deg)
                     & (d_tr * 100.0 < m.delta_t_converged_cm)
                     & fresh)
        return pose, P, degenerate, it + 1, converged, A

    def cond(state):
        _, _, _, it, converged, _ = state
        return (it < m.scan2map_iters) & ~converged

    def solve(p0):
        f32 = jnp.float32
        nc, ns = corner_pts.shape[0], surf_pts.shape[0]
        a0 = (jnp.zeros((nc, 3), f32), jnp.zeros((nc, 3), f32),
              jnp.zeros((nc,), f32), jnp.zeros((ns, 3), f32),
              jnp.zeros((ns,), f32), jnp.zeros((ns,), f32))
        init = (p0, jnp.eye(6, dtype=p0.dtype), jnp.bool_(False),
                jnp.int32(0), jnp.bool_(False), a0)
        pose, *_ = jax.lax.while_loop(cond, body, init)
        return pose

    return jax.lax.cond(enough, solve, lambda p: p, pose0)
