"""Stage 3 — map optimization pipeline step.

The ``MapOptimization::run`` loop body (``mapOptmization.cpp:1521-1570``)
as one pure jittable function over an explicit ``MappingState``: pose
prediction from the latest odometry + mapping correction, submap assembly,
scan-to-map GN, keyframe insertion.  Loop closure and the pose-graph solve
live in ``loop/`` and ``graph/posegraph.py``; without closures the iSAM2
chain (prior + between factors only) has the composed odometry as its
exact solution (``saveKeyFramesAndFactor``, :1335-1478), so keyframe poses
here come straight from scan-to-map — matching the reference's output
semantics bit-for-purpose.

Stage 4 (TransformFusion, ``transformFusion.cpp``) collapses to
:func:`fuse_pose` — one closed-form composition at odometry rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from ..core import se3
from ..core.config import LegoLoamConfig
from ..core.types import AssociationOut
from ..graph.keyframes import (CORNER_CAP, OUTLIER_CAP, SCAN2D_CAP,
                               SURF_CAP, KeyframeStore, assemble_submap,
                               empty_store, insert_keyframe)
from ..graph.posegraph import (FactorGraph, add_factor, empty_graph,
                               optimize_poses)
from ..loop.detect import detect_and_verify
from ..match.voxelhash import voxel_downsample
from ..solve.scan2map import scan_to_map

Array = jax.Array


@struct.dataclass
class MappingState:
    store: KeyframeStore
    graph: FactorGraph
    factor_count: Array    # () int32
    cycle: Array           # () int32 mapping cycles run (loop cadence)
    aft_mapped: Array      # (6,) map-frame pose at last mapping step
    bef_mapped: Array      # (6,) odometry pose at last mapping step
    initialized: Array     # () bool


def init_state(cfg: LegoLoamConfig) -> MappingState:
    m = cfg.mapping
    return MappingState(
        store=empty_store(cfg),
        graph=empty_graph(m.max_keyframes + m.max_loop_factors),
        factor_count=jnp.int32(0),
        cycle=jnp.int32(0),
        aft_mapped=jnp.zeros((6,), jnp.float32),
        bef_mapped=jnp.zeros((6,), jnp.float32),
        initialized=jnp.bool_(False))


def predict_pose(state: MappingState, odom: Array) -> Array:
    """``transformAssociateToMap`` (``mapOptmization.cpp:264-387``) in one
    line of SE(3): carry the last mapping correction forward."""
    return se3.normalize_angles(
        se3.compose(state.aft_mapped, se3.relative(state.bef_mapped, odom)))


def fuse_pose(state: MappingState, odom: Array) -> Array:
    """Stage 4, ``TransformFusion::transformAssociateToMap``
    (``transformFusion.cpp:64-185``): drift-corrected pose at odometry
    rate."""
    return predict_pose(state, odom)


@functools.partial(jax.jit, static_argnames="cfg")
def mapping_step(state: MappingState, assoc: AssociationOut,
                 cfg: LegoLoamConfig):
    """One mapping cycle.  Returns (new_state, mapped_pose (6,))."""
    m = cfg.mapping
    pred = predict_pose(state, assoc.odom)

    # downsampleCurrentScan (:999-1026)
    corner_ds, corner_ok = voxel_downsample(
        assoc.corner_xyz, assoc.corner_valid, m.corner_leaf_size,
        CORNER_CAP)
    surf_ds, surf_ok = voxel_downsample(
        assoc.surf_xyz, assoc.surf_valid, m.surf_leaf_size, SURF_CAP)
    outlier_ds, outlier_ok = voxel_downsample(
        assoc.outlier_xyz, assoc.outlier_valid, m.outlier_leaf_size,
        OUTLIER_CAP)
    # surf-total = surf + outlier re-filtered at 0.4 (:1014-1024)
    surf_total, surf_total_ok = voxel_downsample(
        jnp.concatenate([surf_ds, outlier_ds], axis=0),
        jnp.concatenate([surf_ok, outlier_ok], axis=0),
        m.surf_leaf_size, SURF_CAP)
    scan2d_ds, scan2d_ok = voxel_downsample(
        assoc.scan2d_xyz, assoc.scan2d_valid, 0.1, SCAN2D_CAP)

    corner_map, surf_map = assemble_submap(
        state.store, pred, cfg, window=m.surrounding_keyframe_search_num)

    pose = scan_to_map(pred, corner_ds, corner_ok, surf_total,
                       surf_total_ok, corner_map, surf_map, cfg)
    pose = se3.normalize_angles(pose)

    # saveKeyFramesAndFactor (:1335-1478): keyframe iff moved ≥ 0.3 m
    last_i = jnp.maximum(state.store.count - 1, 0)
    last_kf = state.store.pose[last_i]
    moved = jnp.linalg.norm(pose[3:] - last_kf[3:])
    is_kf = (~state.initialized) | (moved >= m.keyframe_distance)

    odom_w = jnp.asarray(m.odom_factor_weight, jnp.float32)

    def do_insert(store, graph, fcount):
        new_store = insert_keyframe(
            store, pose, assoc.stamp,
            corner_ds, corner_ok, surf_ds, surf_ok,
            outlier_ds, outlier_ok, scan2d_ds, scan2d_ok)

        def first(graph, fcount):
            # PriorFactor on node 0 (:1363-1369)
            return graph.replace(prior=pose), fcount

        def later(graph, fcount):
            # BetweenFactor(prev, new) (:1384-1398)
            z = se3.relative(last_kf, pose)
            graph, fcount = add_factor(
                graph, fcount, last_i, store.count, z, odom_w)
            return graph, fcount

        graph, fcount = jax.lax.cond(store.count == 0, first, later,
                                     graph, fcount)
        return new_store, graph, fcount

    store, graph, fcount = jax.lax.cond(
        is_kf, do_insert, lambda s, g, f: (s, g, f),
        state.store, state.graph, state.factor_count)

    # --- loop closure, every loop_every_n_mapping cycles (:1562-1568)
    run_loop = (jnp.bool_(m.enable_loop_closure)
                & (state.cycle % m.loop_every_n_mapping == 0)
                & (store.count > 2))

    def with_loop(store, graph, fcount, aft):
        res = detect_and_verify(store, assoc.stamp, cfg)

        def closed(store, graph, fcount, aft):
            w = jnp.full((6,), 1.0 / jnp.sqrt(
                jnp.maximum(res["fitness"], 1e-4)), jnp.float32)
            graph, fcount = add_factor(
                graph, fcount, res["latest_idx"], res["old_idx"],
                res["z"], w)
            # correctPoses (:1481-1511): full re-solve + pose rewrite.
            # The stiff odometry chain vs soft loop factors puts the
            # normal equations' condition ratio near 1e6 — block-Jacobi
            # PCG needs hundreds of iterations to actually transmit a
            # loop correction through a 400-node chain.
            # Warm-started from the current poses the solve is
            # incremental (iSAM2's role): 2-3 GN steps suffice, and the
            # PCG's relative-tolerance exit keeps re-solves cheap.
            old_latest = store.pose[res["latest_idx"]]
            new_poses = optimize_poses(store.pose, store.count, graph,
                                       gn_iters=3, pcg_iters=384)
            store = store.replace(pose=new_poses)
            # carry the correction onto the CURRENT pose (which may be up
            # to keyframe_distance ahead of the last keyframe)
            corr = se3.compose(new_poses[res["latest_idx"]],
                               se3.inverse(old_latest))
            aft = se3.normalize_angles(se3.compose(corr, aft))
            return store, graph, fcount, aft

        return jax.lax.cond(res["found"], closed,
                            lambda s, g, f, a: (s, g, f, a),
                            store, graph, fcount, aft)

    store, graph, fcount, pose = jax.lax.cond(
        run_loop, with_loop, lambda s, g, f, a: (s, g, f, a),
        store, graph, fcount, pose)

    new_state = MappingState(
        store=store,
        graph=graph,
        factor_count=fcount,
        cycle=state.cycle + 1,
        aft_mapped=pose,
        bef_mapped=assoc.odom,
        initialized=jnp.bool_(True))
    return new_state, pose
