"""Stage 2b — two-step Gauss-Newton scan-to-scan odometry.

TPU-native reimplementation of ``FeatureAssociation::updateTransformation``
(``featureAssociation.cpp:1213-1235``) and its helpers:

* the unknown θ is the sensor's motion during the sweep (pose of the
  sweep-end frame in the sweep-start frame); constant velocity ⇒ the
  sensor pose at relative time s is ``scale_pose(θ, s)``
  (= ``TransformToStart``, :388-418, in our clean convention);
* step A solves [roll, pitch, t_z] from planar (ground) correspondences
  (= camera-frame [rx, rz, ty], ``calculateTransformationSurf`` :785-925);
* step B solves [yaw, t_x, t_y] from corner correspondences
  (``calculateTransformationCorner`` :928-1032);
* correspondences re-searched every 5 iterations (:511, :649) with the
  ±2.5-ring window semantics, here as masked argmin over an MXU distance
  matrix instead of KD-tree walks;
* eigenvalue degeneracy guard at iteration 0 (:869-898) and the
  0.1 deg / 0.1 cm convergence exits (:912-920).

Deviation from the reference (documented, intentional): Jacobians come
from ``jax.jacfwd`` through the exact interpolated deskew chain, whereas
the reference pairs full-pose closed-form partials with the interpolated
residual and compensates with a 0.05 step scale (:851-857).  The exact
Jacobian admits a full GN step with mild LM damping and converges in fewer
iterations.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from flax import struct

from ..core import se3
from ..core.config import LegoLoamConfig
from ..core.types import FeatureCloud
from ..match import banded
from ..match.bruteforce import (masked_nn, nn_in_ring_window,
                                pairwise_sqdist)

Array = jax.Array

_SURF_FREE = np.array([0, 1, 5])     # roll, pitch, tz
_CORNER_FREE = np.array([2, 3, 4])   # yaw, tx, ty


def deskew_to_start(theta: Array, xyz: Array, s: Array) -> Array:
    """Point fired at relative time s → sweep-start frame."""
    return se3.apply(se3.scale_pose(theta, s[..., None]), xyz)


def deskew_to_end(theta: Array, xyz: Array, s: Array) -> Array:
    """Point fired at relative time s → sweep-end frame
    (= ``TransformToEnd``, ``featureAssociation.cpp:422-471``)."""
    return se3.apply_inverse(theta, deskew_to_start(theta, xyz, s))


@struct.dataclass
class _Corr:
    """Correspondence GEOMETRY carried across GN iterations.

    The matched plane/line lives in the (static) last frame, so it is
    constant w.r.t. θ: the search precomputes (anchor a, unit u) once and
    the per-iteration residual is just deskew + one dot product — no
    gathers or cross products inside the loop or its jacfwd tape.
    For surf, u = plane unit normal; for corner, u = line direction."""
    a: Array           # (Q, 3) anchor point on the plane/line
    u: Array           # (Q, 3) unit normal (surf) / unit direction (corner)
    ok: Array          # (Q,)


def _search_surf(theta, flat: FeatureCloud, last: FeatureCloud,
                 cfg: LegoLoamConfig) -> _Corr:
    """3-point plane correspondence (``findCorrespondingSurfFeatures``,
    ``featureAssociation.cpp:640-733``): 1-NN j1, nearest same-or-lower
    ring j2, nearest higher ring j3, all within ±2.5 rings and 5 m."""
    f = cfg.feature
    max_d2 = f.nearest_feature_search_dist ** 2
    x = deskew_to_start(theta, flat.xyz, flat.rel_time)
    d2 = pairwise_sqdist(x, last.xyz)
    d2 = jnp.where(flat.valid[:, None], d2, 3e38)

    j1, dist1 = masked_nn(d2, last.valid)
    ok1 = (dist1 < max_d2) & flat.valid
    r1 = jnp.floor(last.ring[j1])

    not_j1 = jnp.arange(last.xyz.shape[0])[None, :] != j1[:, None]
    d2x = jnp.where(not_j1, d2, 3e38)
    j2, dist2 = nn_in_ring_window(
        d2x, jnp.floor(last.ring), last.valid, r1,
        lo=-f.ring_window, hi=0.0)
    j3, dist3 = nn_in_ring_window(
        d2x, jnp.floor(last.ring), last.valid, r1,
        lo=1.0e-3, hi=f.ring_window)
    ok = ok1 & (dist2 < max_d2) & (dist3 < max_d2)

    a = last.xyz[j1]
    b = last.xyz[j2]
    c = last.xyz[j3]
    n = jnp.cross(b - a, c - a)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-12)[..., None]
    return _Corr(a=a, u=n, ok=ok)


def _masked_centroid(xyz: Array, valid: Array) -> Array:
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid[:, None], xyz, 0.0), axis=0) / n


def _make_search_surf_banded(cand: "banded.BandedCandidates", V: int,
                             qc: int):
    """Banded variant of :func:`_search_surf` (same ±2.5-ring j2/j3
    semantics, ``featureAssociation.cpp:640-733``) over per-ring blocks —
    the (Q, M) matrix becomes (V, qc, (2B+1)·cc), ~10× smaller at HDL-64
    (``match/banded.py`` has the layout story).  Absolute 5 m gates are
    EXACT here (difference-first recompute on the winners)."""

    def search(theta, flat: FeatureCloud, last, cfg) -> _Corr:
        del last
        f = cfg.feature
        max_d2 = f.nearest_feature_search_dist ** 2
        x = deskew_to_start(theta, flat.xyz, flat.rel_time)
        center = _masked_centroid(x, flat.valid)
        xq = x.reshape(V, qc, 3)
        okq = flat.valid.reshape(V, qc)

        d2 = banded.banded_sqdist(xq, center, cand)       # (V, qc, Wc)
        okc = cand.valid[:, None, :]
        j1, _ = banded.masked_argmin(d2, okc)
        a = banded.gather_band(cand, j1)                  # (V, qc, 3)
        dist1 = banded.exact_sqdist_to(xq, a)
        ok1 = (dist1 < max_d2) & okq

        rc = jnp.floor(cand.ring)[:, None, :]             # (V, 1, Wc)
        r1 = jnp.floor(jnp.take_along_axis(cand.ring, j1, axis=1))
        not_j1 = (jnp.arange(d2.shape[-1])[None, None, :]
                  != j1[..., None])
        win2 = (rc >= r1[..., None] - f.ring_window) & (rc <= r1[..., None])
        win3 = ((rc >= r1[..., None] + 1.0e-3)
                & (rc <= r1[..., None] + f.ring_window))
        j2, _ = banded.masked_argmin(d2, okc & win2 & not_j1)
        j3, _ = banded.masked_argmin(d2, okc & win3 & not_j1)
        b = banded.gather_band(cand, j2)
        c = banded.gather_band(cand, j3)
        dist2 = banded.exact_sqdist_to(xq, b)
        dist3 = banded.exact_sqdist_to(xq, c)
        # a window with no valid candidate returns an arbitrary row whose
        # exact distance then fails the 5 m gate — but guard the fully
        # empty band explicitly (masked_argmin picks col 0 of a valid
        # neighbour ring otherwise? no: mask includes cand.valid)
        has2 = jnp.any(okc & win2 & not_j1, axis=-1)
        has3 = jnp.any(okc & win3 & not_j1, axis=-1)
        ok = (ok1 & has2 & has3
              & (dist2 < max_d2) & (dist3 < max_d2))

        n = jnp.cross(b - a, c - a)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-12)[..., None]
        return _Corr(a=a.reshape(-1, 3), u=n.reshape(-1, 3),
                     ok=ok.reshape(-1))

    return search


def _make_search_corner_banded(cand: "banded.BandedCandidates", V: int,
                               qc: int):
    """Banded variant of :func:`_search_corner`
    (``featureAssociation.cpp:503-569``): 1-NN + nearest point in a
    *different* ring within ±2.5, over per-ring blocks."""

    def search(theta, sharp: FeatureCloud, last, cfg) -> _Corr:
        del last
        f = cfg.feature
        max_d2 = f.nearest_feature_search_dist ** 2
        x = deskew_to_start(theta, sharp.xyz, sharp.rel_time)
        center = _masked_centroid(x, sharp.valid)
        xq = x.reshape(V, qc, 3)
        okq = sharp.valid.reshape(V, qc)

        d2 = banded.banded_sqdist(xq, center, cand)
        okc = cand.valid[:, None, :]
        j1, _ = banded.masked_argmin(d2, okc)
        a = banded.gather_band(cand, j1)
        dist1 = banded.exact_sqdist_to(xq, a)
        ok1 = (dist1 < max_d2) & okq

        rc = jnp.floor(cand.ring)[:, None, :]
        r1 = jnp.floor(jnp.take_along_axis(cand.ring, j1, axis=1))
        win = ((rc >= r1[..., None] - f.ring_window)
               & (rc <= r1[..., None] + f.ring_window)
               & (rc != r1[..., None]))
        j2, _ = banded.masked_argmin(d2, okc & win)
        b = banded.gather_band(cand, j2)
        dist2 = banded.exact_sqdist_to(xq, b)
        has2 = jnp.any(okc & win, axis=-1)
        ok = ok1 & has2 & (dist2 < max_d2)

        u = b - a
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1), 1e-12)[..., None]
        return _Corr(a=a.reshape(-1, 3), u=u.reshape(-1, 3),
                     ok=ok.reshape(-1))

    return search


def _search_corner(theta, sharp: FeatureCloud, last: FeatureCloud,
                   cfg: LegoLoamConfig) -> _Corr:
    """2-point line correspondence (``findCorrespondingCornerFeatures``,
    ``featureAssociation.cpp:503-569``): 1-NN j1 + nearest point in a
    *different* ring within ±2.5."""
    f = cfg.feature
    max_d2 = f.nearest_feature_search_dist ** 2
    x = deskew_to_start(theta, sharp.xyz, sharp.rel_time)
    d2 = pairwise_sqdist(x, last.xyz)
    d2 = jnp.where(sharp.valid[:, None], d2, 3e38)

    j1, dist1 = masked_nn(d2, last.valid)
    ok1 = (dist1 < max_d2) & sharp.valid
    r1 = jnp.floor(last.ring[j1])
    j2, dist2 = nn_in_ring_window(
        d2, jnp.floor(last.ring), last.valid, r1,
        lo=-f.ring_window, hi=f.ring_window, exclude_center_ring=True)
    ok = ok1 & (dist2 < max_d2)

    a = last.xyz[j1]
    b = last.xyz[j2]
    u = b - a
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1), 1e-12)[..., None]
    return _Corr(a=a, u=u, ok=ok)


def _surf_dist(theta, flat: FeatureCloud, last: FeatureCloud, corr: _Corr):
    """Point-to-plane residual (:735-769).

    Returns (residual (N,1), |d| (N,), transformed points (N,3)).  The
    signed scalar distance is already smooth in θ, so GN applies directly.
    """
    del last
    x = deskew_to_start(theta, flat.xyz, flat.rel_time)
    d = jnp.sum(corr.u * (x - corr.a), axis=-1)
    return d[:, None], jnp.abs(d), x


def _corner_dist(theta, sharp: FeatureCloud, last: FeatureCloud,
                 corr: _Corr):
    """Point-to-line residual (:571-620) as the smooth 3-D perpendicular
    vector r = (x−a) − ((x−a)·û)û instead of the reference's unsigned
    scalar |AM×AB|/|AB|.  Same minimiser (‖r‖ = d), but GN on the unsigned
    cone limit-cycles — which is why the reference needs its 0.05 step
    scale (featureAssociation.cpp:857); the vector form converges
    quadratically at full step.

    Returns (residual (N,3), |d| (N,), transformed points (N,3)).
    """
    del last
    x = deskew_to_start(theta, sharp.xyz, sharp.rel_time)
    v = x - corr.a
    r = v - jnp.sum(v * corr.u, axis=-1, keepdims=True) * corr.u
    return r, jnp.linalg.norm(r, axis=-1), x


def _weights(d: Array, x: Array, it: Array, kind: str) -> Array:
    """Robust weights (:607-612 corner, :761-766 surf): down-weight by
    residual magnitude after iteration 5, reject below 0.1."""
    if kind == "surf":
        rng = jnp.linalg.norm(x, axis=-1)
        w_late = 1.0 - 1.8 * jnp.abs(d) / jnp.sqrt(jnp.sqrt(
            jnp.maximum(rng, 1e-9)))
    else:
        w_late = 1.0 - 1.8 * jnp.abs(d)
    w = jnp.where(it >= 5, w_late, 1.0)
    return jnp.where((w > 0.1) & (jnp.abs(d) > 1e-12), w, 0.0)


def _gn_phase(theta0: Array, free_idx: Array, query: FeatureCloud,
              last: FeatureCloud, search_fn, dist_fn, kind: str,
              max_iters: int, cfg: LegoLoamConfig) -> Array:
    """One phase (surf or corner) of the two-step solver: `lax.while_loop`
    of masked GN iterations with cached correspondences."""
    f = cfg.feature
    eig_thr = f.degeneracy_eig_threshold

    def body(state):
        theta, corr, P, degenerate, it, _ = state
        corr = jax.lax.cond(
            it % 5 == 0,
            lambda: search_fn(theta, query, last, cfg),
            lambda: corr)

        free0 = theta[free_idx]

        def r_of(free):
            th = theta.at[free_idx].set(free)
            r, _, _ = dist_fn(th, query, last, corr)
            return r.reshape(-1)                          # (N*D,)

        r, d_abs, x = dist_fn(theta, query, last, corr)
        w = _weights(d_abs, x, it, kind) * corr.ok.astype(jnp.float32)
        n_sel = jnp.sum(w > 0.0)
        w_rows = jnp.repeat(w, r.shape[-1])               # weight per row

        J = jax.jacfwd(r_of)(free0)                       # (N*D, 3)
        Jw = J * w_rows[:, None]
        H = Jw.T @ Jw
        g = Jw.T @ (w_rows * r.reshape(-1))
        H_damped = H + f.odom_lm_lambda * jnp.diag(jnp.diag(H)) \
            + 1e-9 * jnp.eye(3)
        dx = -f.odom_step_scale * jnp.linalg.solve(H_damped, g)

        # degeneracy guard on the first iteration (:869-898)
        def guard():
            evals, V = jnp.linalg.eigh(H)
            keep = evals >= eig_thr
            V2 = V * keep[None, :]
            return (V2 @ V.T).astype(theta.dtype), ~jnp.all(keep)

        P, degenerate = jax.lax.cond(
            it == 0, guard, lambda: (P, degenerate))
        dx = jnp.where(degenerate, P @ dx, dx)
        dx = jnp.where(jnp.isnan(dx) | (n_sel < f.min_selected), 0.0, dx)

        theta = theta.at[free_idx].add(dx)
        # convergence: ΔR < 0.1 deg, ΔT < 0.1 cm (:912-920); rotation
        # components are those of free_idx < 3
        rot_mask = free_idx < 3
        d_rot = jnp.sqrt(jnp.sum(jnp.where(rot_mask, dx, 0.0) ** 2))
        d_tr = jnp.sqrt(jnp.sum(jnp.where(rot_mask, 0.0, dx) ** 2))
        converged = ((jnp.degrees(d_rot) < f.delta_r_converged_deg)
                     & (d_tr * 100.0 < f.delta_t_converged_cm)
                     & (n_sel >= f.min_selected))
        return theta, corr, P, degenerate, it + 1, converged

    def cond(state):
        _, _, _, _, it, converged = state
        return (it < max_iters) & ~converged

    corr0 = search_fn(theta0, query, last, cfg)
    init = (theta0, corr0, jnp.eye(3, dtype=theta0.dtype),
            jnp.bool_(False), jnp.int32(0), jnp.bool_(False))
    theta, *_ = jax.lax.while_loop(cond, body, init)
    return theta


@functools.partial(jax.jit, static_argnames="cfg")
def two_step_odometry(theta0: Array, sharp: FeatureCloud,
                      flat: FeatureCloud, last_corner: FeatureCloud,
                      last_surf: FeatureCloud,
                      cfg: LegoLoamConfig) -> Array:
    """Estimate the sweep motion θ (``updateTransformation``,
    ``featureAssociation.cpp:1213-1235``).

    Skipped entirely (θ passes through) when the previous feature clouds
    are too thin (corner<10 ∨ surf<100, :1214).
    """
    f = cfg.feature
    enough = ((last_corner.count >= f.min_corner_features)
              & (last_surf.count >= f.min_surf_features))

    if f.odom_band_rings > 0:
        # banded per-ring-window search (match/banded.py): with
        # odom_band_rings on, the frontend emits ALL pick clouds
        # ring-blocked (``features._blocked_from_picks``; less_flat is
        # blocked by construction), so the solver's re-layout cost is
        # zero — queries and candidates alike are pure reshapes, then
        # the candidate bands are static roll-concats.  GN sums are
        # order-invariant, so only the correspondence CANDIDATE set
        # differs from the full search (far-ring 1-NNs outside ±B are
        # dropped).
        V = cfg.laser.num_vertical_scans
        for c in (flat, sharp, last_corner, last_surf):
            assert c.valid.shape[0] % V == 0, \
                "banded odometry requires ring-blocked cloud capacities"
        qc_flat = flat.valid.shape[0] // V
        qc_sharp = sharp.valid.shape[0] // V

        # The band tensors are built INSIDE the search closures (under
        # the while-loop's reassociation cond), NOT hoisted as loop
        # constants: carrying the roll-concat band through the
        # cond-in-while-in-scan nest triggered an XLA:TPU codegen fault
        # at HDL-64 shapes (hardware kernel crash, reproduced r5).
        # Re-banding costs one ~2 MB concat per re-association — noise.
        def search_surf(theta, flat_c, last, cfg):
            sb = banded.band(banded.ring_block_from_layout(last, V),
                             f.odom_band_rings)
            return _make_search_surf_banded(sb, V, qc_flat)(
                theta, flat_c, None, cfg)

        def search_corner(theta, sharp_c, last, cfg):
            cb = banded.band(banded.ring_block_from_layout(last, V),
                             f.odom_band_rings)
            return _make_search_corner_banded(cb, V, qc_sharp)(
                theta, sharp_c, None, cfg)

        flat_q, sharp_q = flat, sharp

        # No cond(enough) around the banded solve: the remaining
        # data-dependent branch around this code inside `lax.scan` was
        # part of the faulting pattern, and it is not needed for
        # safety — with thin clouds every correspondence fails the 5 m
        # gate, n_sel < min_selected zeroes the update, and NaN updates
        # reset to 0 (:907-909 semantics), so the solve degenerates to
        # the passthrough the cond would have taken.
        def solve_banded(theta0):
            th = _gn_phase(theta0, _SURF_FREE, flat_q, last_surf,
                           search_surf, _surf_dist, "surf",
                           f.odom_surf_iters, cfg)
            th = _gn_phase(th, _CORNER_FREE, sharp_q, last_corner,
                           search_corner, _corner_dist, "corner",
                           f.odom_corner_iters, cfg)
            return th

        return jnp.where(enough, solve_banded(theta0), theta0)

    search_surf, search_corner = _search_surf, _search_corner
    flat_q, sharp_q = flat, sharp

    def solve(theta0):
        th = _gn_phase(theta0, _SURF_FREE, flat_q, last_surf,
                       search_surf, _surf_dist, "surf",
                       f.odom_surf_iters, cfg)
        th = _gn_phase(th, _CORNER_FREE, sharp_q, last_corner,
                       search_corner, _corner_dist, "corner",
                       f.odom_corner_iters, cfg)
        return th

    return jax.lax.cond(enough, solve, lambda t: t, theta0)
