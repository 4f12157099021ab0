"""Stage 3 — map optimization pipeline step.

The ``MapOptimization::run`` loop body (``mapOptmization.cpp:1521-1570``)
as one pure jittable function: pose prediction from the latest odometry +
mapping correction, submap assembly, scan-to-map GN, keyframe insertion.
Loop closure and the pose-graph solve live in ``loop/`` and
``graph/posegraph.py``; without closures the iSAM2 chain (prior + between
factors only) has the composed odometry as its exact solution
(``saveKeyFramesAndFactor``, :1335-1478), so keyframe poses here come
straight from scan-to-map — matching the reference's output semantics
bit-for-purpose.

State is split TPU-consciously: :class:`MappingMeta` (poses, graph,
~200 KB) is what crosses the run-mapping ``lax.cond`` in ``pipeline/slam``;
the big :class:`KeyframeClouds` blocks are a read-only cond *operand*, and
the single inserted row comes back as a :class:`KeyframeRow` that the
caller scatters in unconditionally (``apply_row``).  If the clouds were
cond outputs, XLA would materialise a full copy of every block on every
scan (~100 MB × 2 ≈ 1 ms of pure HBM traffic at VLP-16 capacities).

Stage 4 (TransformFusion, ``transformFusion.cpp``) collapses to
:func:`fuse_pose` — one closed-form composition at odometry rate.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

from ..core import se3
from ..core.config import LegoLoamConfig
from ..core.types import AssociationOut
from ..graph import submap_grid
from ..graph.keyframes import (CORNER_CAP, OUTLIER_CAP, SCAN2D_CAP,
                               SURF_CAP, KeyframeClouds, KeyframeStore,
                               assemble_submap, empty_clouds, make_row)
from ..distributed.sharded_pgo import optimize_poses_sharded
from ..graph.posegraph import (FactorGraph, add_factor, empty_graph,
                               optimize_poses)
from ..loop.detect import detect_and_verify
from ..match.voxelhash import voxel_downsample
from ..solve.scan2map import scan_to_map

Array = jax.Array


@struct.dataclass
class MappingMeta:
    """Everything in the mapping state EXCEPT the keyframe cloud blocks."""

    kf_pose: Array         # (K, 6) map-frame keyframe poses
    kf_stamp: Array        # (K,)
    kf_count: Array        # () int32
    grid: submap_grid.SubmapGrid   # incremental world-frame submap
    graph: FactorGraph
    factor_count: Array    # () int32
    cycle: Array           # () int32 mapping cycles run (loop cadence)
    aft_mapped: Array      # (6,) map-frame pose at last mapping step
    bef_mapped: Array      # (6,) odometry pose at last mapping step
    initialized: Array     # () bool
    # Saturation counters — the reference grows its keyframe arrays and
    # iSAM2 graph without bound (mapOptmization.cpp:1431-1474); our
    # fixed-capacity stores must NEVER silently drop.  A nonzero counter
    # means max_keyframes / max_loop_factors is undersized for the run
    # (checked by benchmarks/stevens_stress.py and surfaced by run.py).
    kf_dropped: Array      # () int32 keyframes lost to capacity
    factor_dropped: Array  # () int32 factors lost to capacity
    map_sat: Array         # () int32 world-frame voxel-filter overflow:
    #   voxels truncated by max_map_corner/max_map_surf (radius-submap
    #   assembly) or loop_history_cap (loop-ICP target).  Key-order
    #   truncation of a WORLD-frame aggregate censors the map at an
    #   x-plane (match/voxelhash.py) — nonzero means those capacities
    #   are undersized for the run.


@struct.dataclass
class MappingState:
    meta: MappingMeta
    clouds: KeyframeClouds

    @property
    def store(self) -> KeyframeStore:
        return KeyframeStore(pose=self.meta.kf_pose,
                             stamp=self.meta.kf_stamp,
                             count=self.meta.kf_count, clouds=self.clouds)

    @property
    def graph(self) -> FactorGraph:
        return self.meta.graph

    @property
    def factor_count(self) -> Array:
        return self.meta.factor_count

    @property
    def aft_mapped(self) -> Array:
        return self.meta.aft_mapped


def init_state(cfg: LegoLoamConfig) -> MappingState:
    m = cfg.mapping
    K = m.max_keyframes
    meta = MappingMeta(
        kf_pose=jnp.zeros((K, 6), jnp.float32),
        kf_stamp=jnp.zeros((K,), jnp.float32),
        kf_count=jnp.int32(0),
        grid=submap_grid.empty_grid(cfg),
        graph=empty_graph(K + m.max_loop_factors),
        factor_count=jnp.int32(0),
        cycle=jnp.int32(0),
        aft_mapped=jnp.zeros((6,), jnp.float32),
        bef_mapped=jnp.zeros((6,), jnp.float32),
        initialized=jnp.bool_(False),
        kf_dropped=jnp.int32(0),
        factor_dropped=jnp.int32(0),
        map_sat=jnp.int32(0))
    return MappingState(meta=meta, clouds=empty_clouds(cfg))


def predict_pose(meta: MappingMeta, odom: Array) -> Array:
    """``transformAssociateToMap`` (``mapOptmization.cpp:264-387``) in one
    line of SE(3): carry the last mapping correction forward."""
    return se3.normalize_angles(
        se3.compose(meta.aft_mapped, se3.relative(meta.bef_mapped, odom)))


def fuse_pose(state: MappingState, odom: Array) -> Array:
    """Stage 4, ``TransformFusion::transformAssociateToMap``
    (``transformFusion.cpp:64-185``): drift-corrected pose at odometry
    rate."""
    return predict_pose(state.meta, odom)


def mapping_step(meta: MappingMeta, clouds: KeyframeClouds,
                 assoc: AssociationOut, cfg: LegoLoamConfig,
                 mesh=None, pgo_axis: str = "pgo"):
    """One mapping cycle.

    ``clouds`` is read-only; the (possibly dropped) inserted keyframe row
    comes back for the caller to ``apply_row``.  Returns
    (new_meta, KeyframeRow, mapped_pose (6,)).

    ``mesh``: optional ``jax.sharding.Mesh`` — when present, the
    loop-closure pose-graph solve runs factor-sharded over
    ``mesh[pgo_axis]`` with one psum per Hessian-vector product
    (``distributed/sharded_pgo.py``), the SURVEY §2.1/§5 scale-out path.
    """
    m = cfg.mapping
    pred = predict_pose(meta, assoc.odom)

    # downsampleCurrentScan (:999-1026).  Exact sort-based centroids here:
    # these clouds become the PERSISTENT keyframe blocks (and scan-to-map
    # queries), where hash-collision loss at load factor ≳ 1 (up to 8 K
    # candidates into 2 K slots) compounds over the whole trajectory —
    # measured 0.94 → 1.62 m ATE on the 2000-scan Stevens stress.  Runs
    # only every mapping cycle (1/5 scans), unlike the per-scan feature
    # filter where the one-scatter hash variant is safe (load ≈ 0.4).
    with jax.named_scope("map_downsample"):
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

    # extractSurroundingKeyFrames (:857-996) has two modes:
    map_sat = meta.map_sat
    with jax.named_scope("submap"):
        if m.enable_loop_closure:
            # loop-ON: latest-N window (:863-913) — read the persistent
            # incremental voxel grid instead of re-assembling 50 keyframes
            # (graph/submap_grid.py; ~7.7 ms/cycle → ~0 on TPU)
            corner_map, surf_map = submap_grid.maps(
                meta.grid, meta.kf_count,
                m.surrounding_keyframe_search_num)
        else:
            # loop-OFF (the reference's default config): 50 m keypose
            # RADIUS search (:917-986) — a revisit must re-associate
            # against the OLD map, which the latest-N window cannot
            # provide.  Assembled from the keyframe store each cycle (the
            # window grid would mix stale world-frame epochs on long
            # runs).
            store0 = KeyframeStore(pose=meta.kf_pose, stamp=meta.kf_stamp,
                                   count=meta.kf_count, clouds=clouds)
            corner_map, surf_map, submap_sat = assemble_submap(
                store0, pred, cfg,
                window=m.surrounding_keyframe_search_num, with_sat=True)
            map_sat = map_sat + submap_sat

    with jax.named_scope("scan2map"):
        pose = scan_to_map(pred, corner_ds, corner_ok, surf_total,
                           surf_total_ok, corner_map, surf_map, cfg)
        pose = se3.normalize_angles(pose)

    # saveKeyFramesAndFactor (:1335-1478): keyframe iff moved ≥ 0.3 m
    K = clouds.capacity
    last_i = jnp.maximum(meta.kf_count - 1, 0)
    last_kf = meta.kf_pose[last_i]
    moved = jnp.linalg.norm(pose[3:] - last_kf[3:])
    is_kf = (~meta.initialized) | (moved >= m.keyframe_distance)
    insert = is_kf & (meta.kf_count < K)
    kf_dropped = meta.kf_dropped + (is_kf & ~insert).astype(jnp.int32)

    with jax.named_scope("kf_insert"):
        idx = jnp.where(insert, meta.kf_count, K)    # K ⇒ scatter dropped
        row = make_row(idx, corner_ds, corner_ok, surf_ds, surf_ok,
                       outlier_ds, outlier_ok, scan2d_ds, scan2d_ok)
        kf_pose = meta.kf_pose.at[idx].set(pose, mode="drop")
        kf_stamp = meta.kf_stamp.at[idx].set(assoc.stamp, mode="drop")
        kf_count = meta.kf_count + insert.astype(jnp.int32)

        if m.enable_loop_closure:
            grid = jax.lax.cond(
                insert,
                lambda g: submap_grid.insert(
                    g, meta.kf_count, pose, corner_ds, corner_ok,
                    surf_ds, surf_ok, outlier_ds, outlier_ok, cfg,
                    window=m.surrounding_keyframe_search_num),
                lambda g: g, meta.grid)
        else:
            grid = meta.grid  # unused in radius mode — skip the scatter

    odom_w = jnp.asarray(m.odom_factor_weight, jnp.float32)
    cap_f = meta.graph.i.shape[0]

    def do_factors(graph, fcount, fdrop):
        def first(g, f, d):
            # PriorFactor on node 0 (:1363-1369)
            return g.replace(prior=pose), f, d

        def later(g, f, d):
            # BetweenFactor(prev, new) (:1384-1398)
            z = se3.relative(last_kf, pose)
            d = d + (f >= cap_f).astype(jnp.int32)
            g, f = add_factor(g, f, last_i, meta.kf_count, z, odom_w)
            return g, f, d

        return jax.lax.cond(meta.kf_count == 0, first, later,
                            graph, fcount, fdrop)

    graph, fcount, fdrop = jax.lax.cond(
        insert, do_factors, lambda g, f, d: (g, f, d),
        meta.graph, meta.factor_count, meta.factor_dropped)

    # --- loop closure, every loop_every_n_mapping cycles (:1562-1568)
    run_loop = (jnp.bool_(m.enable_loop_closure)
                & (meta.cycle % m.loop_every_n_mapping == 0)
                & (kf_count > 2))

    def with_loop(kf_pose_a, grid, graph, fcount, fdrop, msat, aft):
        store2 = KeyframeStore(pose=kf_pose_a, stamp=kf_stamp,
                               count=kf_count, clouds=clouds)
        res = detect_and_verify(store2, row, assoc.stamp, cfg,
                                robot_pose=pose)
        msat = msat + res["sat"]
        # per-attempt observability (threaded to replay outputs):
        # [attempted, accepted, fitness, corr_trans, corr_rot,
        #  old_idx, latest_idx, relin_or_implausible]
        # The gate measures the RAW ICP correction in the latest
        # keyframe's frame (res["corr"]; corrected = corr ∘ kf_pose) —
        # a world-frame pose difference would conjugate the rotation
        # through the pose and pick up a phantom |corr_rot|·|t_pose|
        # translation (~0.4 m at 50 m for 0.5°, vs the 0.1 m
        # threshold), triggering position-dependent spurious re-solves
        # (ADVICE r4 medium).
        corr = res["corr"]
        do_relin = (
            (jnp.linalg.norm(corr[3:]) > m.loop_relin_trans)
            | (jnp.max(jnp.abs(corr[:3]))
               > jnp.deg2rad(m.loop_relin_rot_deg)))
        diag = jnp.stack([
            jnp.float32(1.0),
            res["found"].astype(jnp.float32),
            jnp.minimum(res["fitness"], 1e6),
            jnp.linalg.norm(corr[3:]),
            jnp.max(jnp.abs(corr[:3])),
            res["old_idx"].astype(jnp.float32),
            res["latest_idx"].astype(jnp.float32),
            # +1 = accepted closure will re-solve; −1 = closure passed
            # the fitness gate but was REJECTED as implausible (drift
            # outside the fixed caps — loop closure silently disabled,
            # ADVICE r4 low)
            (res["found"] & do_relin).astype(jnp.float32)
            - res["implausible"].astype(jnp.float32)])

        def closed(kf_pose_a, grid, graph, fcount, fdrop, aft):
            w = jnp.full((6,), 1.0 / jnp.sqrt(
                jnp.maximum(res["fitness"], 1e-4)), jnp.float32)
            fdrop = fdrop + (fcount >= cap_f).astype(jnp.int32)
            graph, fcount = add_factor(
                graph, fcount, res["latest_idx"], res["old_idx"],
                res["z"], w)

            # correctPoses (:1481-1511) — thresholded like iSAM2
            # itself (config.py::loop_relin_trans): the factor is in
            # the graph above unconditionally; the full GN re-solve +
            # pose rewrite + grid rebuild runs only when the ICP
            # correction exceeds the relinearization threshold.
            def relin(kf_pose_a, grid, aft):
                # The cyclic-reduction chain preconditioner
                # (posegraph.py) solves the stiff odometry chain
                # EXACTLY, leaving PCG only the low-rank loop-factor
                # perturbation — a handful of iterations regardless of
                # chain length.  Warm-started from the current poses
                # the solve is incremental (iSAM2's role): 2-3 GN
                # steps suffice.
                old_latest = kf_pose_a[res["latest_idx"]]
                if mesh is not None:
                    new_poses = optimize_poses_sharded(
                        kf_pose_a, kf_count, graph, mesh,
                        axis=pgo_axis, gn_iters=3, pcg_iters=64)
                else:
                    new_poses = optimize_poses(
                        kf_pose_a, kf_count, graph,
                        gn_iters=3, pcg_iters=64)
                # carry the correction onto the CURRENT pose (which may
                # be up to keyframe_distance ahead of the last keyframe)
                corr = se3.compose(new_poses[res["latest_idx"]],
                                   se3.inverse(old_latest))
                aft = se3.normalize_angles(se3.compose(corr, aft))
                # the world-frame submap grid is stale after the
                # rewrite — re-scatter it under the corrected poses
                # (the reference clears its transformed-cloud cache
                # here, :1497)
                grid = submap_grid.rebuild(
                    new_poses, kf_count, clouds, cfg,
                    window=m.surrounding_keyframe_search_num)
                return new_poses, grid, aft

            kf_pose_a, grid, aft = jax.lax.cond(
                do_relin, relin, lambda p, gr, a: (p, gr, a),
                kf_pose_a, grid, aft)
            return kf_pose_a, grid, graph, fcount, fdrop, aft

        p, gr, g, f, d, a = jax.lax.cond(
            res["found"], closed,
            lambda p, gr, g, f, d, a: (p, gr, g, f, d, a),
            kf_pose_a, grid, graph, fcount, fdrop, aft)
        return p, gr, g, f, d, msat, a, diag

    with jax.named_scope("loop_closure"):
        (kf_pose, grid, graph, fcount, fdrop, map_sat, pose,
         loop_diag) = jax.lax.cond(
            run_loop, with_loop,
            lambda p, gr, g, f, d, s, a: (
                p, gr, g, f, d, s, a, jnp.zeros((8,), jnp.float32)),
            kf_pose, grid, graph, fcount, fdrop, map_sat, pose)

    new_meta = MappingMeta(
        kf_pose=kf_pose, kf_stamp=kf_stamp, kf_count=kf_count, grid=grid,
        graph=graph, factor_count=fcount, cycle=meta.cycle + 1,
        aft_mapped=pose, bef_mapped=assoc.odom,
        initialized=jnp.bool_(True),
        kf_dropped=kf_dropped, factor_dropped=fdrop, map_sat=map_sat)
    return new_meta, row, pose, loop_diag
