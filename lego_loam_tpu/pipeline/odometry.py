"""Per-scan odometry stage — the ``runFeatureAssociation`` loop body
(``featureAssociation.cpp:1386-1450``) as one pure jittable step.

The reference's FA thread state (last clouds, KD-trees, transformCur,
transformSum) becomes an explicit ``OdometryState`` pytree threaded through
``lax.scan`` during offline replay — the determinism the BOR fork built its
Channel machinery for (``README.md:16-20``) falls out of functional purity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.config import LegoLoamConfig
from ..core.types import (AssociationOut, FeatureCloud, FeatureSet,
                          OdometryState, ProjectionOut)
from ..frontend.features import extract_features
from ..solve.odometry import deskew_to_end, two_step_odometry

Array = jax.Array


def _empty_cloud(n: int) -> FeatureCloud:
    return FeatureCloud(
        xyz=jnp.zeros((n, 3), jnp.float32),
        ring=jnp.zeros((n,), jnp.float32),
        rel_time=jnp.zeros((n,), jnp.float32),
        valid=jnp.zeros((n,), bool))


def init_state(cfg: LegoLoamConfig) -> OdometryState:
    f = cfg.feature
    return OdometryState(
        initialized=jnp.bool_(False),
        transform_cur=jnp.zeros((6,), jnp.float32),
        odom=jnp.zeros((6,), jnp.float32),
        last_corner=_empty_cloud(f.max_less_sharp),
        last_surf=_empty_cloud(f.max_less_flat))


def _to_end(theta: Array, fc: FeatureCloud) -> FeatureCloud:
    """De-skew a feature cloud to the sweep-end frame
    (``publishCloudsLast``, ``featureAssociation.cpp:1329-1383``)."""
    xyz = deskew_to_end(theta, fc.xyz, fc.rel_time)
    return fc.replace(xyz=jnp.where(fc.valid[:, None], xyz, 0.0))


@functools.partial(jax.jit, static_argnames="cfg")
def odometry_step(state: OdometryState, proj: ProjectionOut,
                  cfg: LegoLoamConfig):
    """One scan through feature extraction + two-step GN odometry.

    Returns (new_state, AssociationOut) — the AssociationOut carries the
    integrated odometry pose and the end-frame feature clouds that feed
    mapping every ``mapping_frequency_divider`` scans (:1432-1448).
    """
    with jax.named_scope("features"):
        feats: FeatureSet = extract_features(proj.segmented, cfg)

    def first_frame(state):
        # checkSystemInitialization (:1181-1209)
        return state.replace(
            initialized=jnp.bool_(True),
            last_corner=feats.less_sharp,
            last_surf=feats.less_flat)

    def normal_frame(state):
        theta_star = two_step_odometry(
            state.transform_cur, feats.sharp, feats.flat,
            state.last_corner, state.last_surf, cfg)
        # physical trust region + cross-frame under-relaxation
        # (FeatureConfig.odom_max_delta_* / odom_relax)
        f = cfg.feature
        limit = jnp.asarray([f.odom_max_delta_rot] * 3
                            + [f.odom_max_delta_trans] * 3, jnp.float32)
        delta = jnp.clip(theta_star - state.transform_cur, -limit, limit)
        theta = se3.normalize_angles(
            state.transform_cur + f.odom_relax * delta)
        odom = se3.normalize_angles(se3.compose(state.odom, theta))
        return state.replace(
            transform_cur=theta,
            odom=odom,
            last_corner=_to_end(theta, feats.less_sharp),
            last_surf=_to_end(theta, feats.less_flat))

    with jax.named_scope("odom_gn"):
        new_state = jax.lax.cond(state.initialized, normal_frame,
                                 first_frame, state)

    out = AssociationOut(
        corner_xyz=new_state.last_corner.xyz,
        corner_valid=new_state.last_corner.valid,
        surf_xyz=new_state.last_surf.xyz,
        surf_valid=new_state.last_surf.valid,
        outlier_xyz=proj.outlier_xyz,
        outlier_valid=proj.outlier_valid,
        odom=new_state.odom,
        scan2d_xyz=proj.scan2d_xyz,
        scan2d_valid=proj.scan2d_valid,
        stamp=proj.stamp)
    return new_state, out
