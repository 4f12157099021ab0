"""Stage 1b — range-image cluster segmentation, TPU-style.

The reference grows clusters with a per-seed BFS over the range image
(``labelComponents``, ``imageProjection.cpp:412-496``) — data-dependent
control flow that cannot map to XLA.  We compute the identical connected
components by **fixed-point min-label propagation**: adjacency edges are
precomputed from the LeGO-LOAM merge criterion

    tan(β) = d₂·sin α / (d₁ − d₂·cos α)  >  tan(segment_theta)

(``imageProjection.cpp:457-465``; symmetric in the two pixels, so BFS
reachability == undirected connected components), then labels — initialised
to each pixel's flat index — are flooded with segmented min-scans along rows
and columns (`lax.associative_scan`) inside a `lax.while_loop` until no
label changes.  Straight runs propagate in O(log H) work per sweep, so the
loop converges in a handful of sweeps for real clouds (cap:
``projection.max_label_iters``).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from ..core.config import LegoLoamConfig
from ..core.types import ProjectionOut, RangeImage, RawScan, SegmentedCloud

Array = jax.Array

_SENTINEL = np.int32(2 ** 30)


def _edge_masks(img: RangeImage, cfg: LegoLoamConfig):
    """Connectivity masks.  ``right[i,j]`` ⇔ (i,j)↔(i,j+1 mod H) merge,
    ``down[i,j]`` ⇔ (i,j)↔(i+1,j) merge.  Only non-ground valid pixels
    participate (ground/invalid pixels get label −1 in the reference,
    ``imageProjection.cpp:293-300``)."""
    laser = cfg.laser
    theta = math.tan(math.radians(cfg.projection.segment_theta_deg))
    segmentable = img.valid & ~img.ground

    def merge(r_a, r_b, alpha):
        d1 = jnp.maximum(r_a, r_b)
        d2 = jnp.minimum(r_a, r_b)
        tang = d2 * math.sin(alpha) / (d1 - d2 * math.cos(alpha))
        return tang > theta

    r = img.rng
    right = (segmentable & jnp.roll(segmentable, -1, axis=1)
             & merge(r, jnp.roll(r, -1, axis=1), laser.ang_res_x))
    down = jnp.zeros_like(segmentable)
    down = down.at[:-1].set(
        segmentable[:-1] & segmentable[1:]
        & merge(r[:-1], r[1:], laser.ang_res_y))
    return segmentable, right, down


def _segmented_min_scan(values: Array, boundary: Array, axis: int,
                        reverse: bool) -> Array:
    """Min-scan of ``values`` along ``axis`` that restarts wherever
    ``boundary`` is True (no propagation across a boundary element)."""
    if reverse:
        values = jnp.flip(values, axis)
        boundary = jnp.flip(boundary, axis)

    def combine(a, b):
        av, af = a
        bv, bf = b
        v = jnp.where(bf, bv, jnp.minimum(av, bv))
        return v, af | bf

    v, _ = jax.lax.associative_scan(combine, (values, boundary), axis=axis)
    if reverse:
        v = jnp.flip(v, axis)
    return v


def label_components(img: RangeImage, cfg: LegoLoamConfig):
    """Connected components under the merge criterion.

    Returns ``(labels, segmentable)`` where ``labels[i,j]`` is the min flat
    index of the pixel's component (sentinel where not segmentable).

    On TPU the fixed-point flood runs as a single VMEM-resident Pallas
    kernel (frontend/pallas_label.py); elsewhere as jnp segmented scans.
    """
    segmentable, right, down = _edge_masks(img, cfg)
    V, H = segmentable.shape

    flat = jnp.arange(V * H, dtype=jnp.int32).reshape(V, H)
    labels0 = jnp.where(segmentable, flat, _SENTINEL)

    # LEGO_LABEL_IMPL=xla forces the jnp path on TPU — a debug escape
    # hatch for isolating Pallas-kernel suspicion (used to clear the
    # kernel during the r5 HDL-64 codegen-fault hunt)
    if (jax.default_backend() == "tpu"
            and os.environ.get("LEGO_LABEL_IMPL", "pallas") != "xla"):
        from .pallas_label import propagate_labels_pallas

        labels = propagate_labels_pallas(
            labels0, right.astype(jnp.int32), down.astype(jnp.int32),
            max_sweeps=cfg.projection.max_label_iters)
        return labels, segmentable

    # boundaries for the scans: element j starts a new segment if it is NOT
    # connected to its predecessor along the scan direction.
    row_fwd_bound = ~jnp.roll(right, 1, axis=1)   # j-1 ↔ j edge
    row_bwd_bound = ~right                        # j ↔ j+1 edge
    col_fwd_bound = ~jnp.roll(down, 1, axis=0)
    col_fwd_bound = col_fwd_bound.at[0].set(True)
    col_bwd_bound = ~down
    wrap = right[:, -1]                           # column H-1 ↔ 0

    def sweep(lab):
        lab = _segmented_min_scan(lab, row_fwd_bound, 1, False)
        lab = _segmented_min_scan(lab, row_bwd_bound, 1, True)
        lab = _segmented_min_scan(lab, col_fwd_bound, 0, False)
        lab = _segmented_min_scan(lab, col_bwd_bound, 0, True)
        # horizontal wraparound (imageProjection.cpp:446-451)
        first = jnp.where(wrap, jnp.minimum(lab[:, 0], lab[:, -1]), lab[:, 0])
        last = jnp.where(wrap, jnp.minimum(lab[:, 0], lab[:, -1]), lab[:, -1])
        lab = lab.at[:, 0].set(first).at[:, -1].set(last)
        return lab

    def cond(state):
        _, changed, it = state
        return changed & (it < cfg.projection.max_label_iters)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (sweep(labels0), jnp.bool_(True), jnp.int32(0)))
    return labels, segmentable


def segment_validity(labels: Array, segmentable: Array,
                     cfg: LegoLoamConfig) -> Array:
    """Per-pixel flag: pixel belongs to a *valid* segment.

    Validity rule (``imageProjection.cpp:477-487``): ≥30 points, or
    ≥``segment_valid_point_num`` points spanning ≥``segment_valid_line_num``
    distinct rings.
    """
    V, H = labels.shape
    n = V * H
    seg_id = jnp.where(segmentable, labels, n).reshape(-1)
    ones = segmentable.astype(jnp.int32).reshape(-1)

    # ONE scatter-add into a flat (segment, ring) table: TPU scatters
    # serialize per INDEX (~10 ns each; ~0.25 ms at VH = 28.8 K), so the
    # index count is the whole cost — but building the r2-era 17-channel
    # one-hot payload cost a further ~2 MB materialize+copy per scan for
    # nothing the (n+1, V) table doesn't give.  Row sums/occupancy of
    # the table are cheap elementwise reductions.
    rows = jax.lax.broadcasted_iota(jnp.int32, (V, H), 0).reshape(-1)
    acc = jnp.zeros(((n + 1) * V,), jnp.int32).at[seg_id * V + rows].add(
        ones, mode="drop").reshape(n + 1, V)
    sizes = jnp.sum(acc, axis=-1)
    lines = jnp.sum(acc > 0, axis=-1)

    p = cfg.projection
    ok = (sizes >= p.segment_min_point_num) | (
        (sizes >= p.segment_valid_point_num)
        & (lines >= p.segment_valid_line_num))
    return ok[jnp.clip(seg_id, 0, n)].reshape(V, H) & segmentable


def _relative_time(img: RangeImage) -> Array:
    """Intra-scan relative time ∈ [0,1) per pixel from azimuth
    (``adjustDistortion``, ``featureAssociation.cpp:161-197``).  Uses a
    modular unwrap instead of the reference's half-pass state machine —
    equivalent for diff ≈ 2π, clamped otherwise."""
    ori = -jnp.arctan2(img.xyz[..., 1], img.xyz[..., 0])
    diff = img.end_orientation - img.start_orientation
    rel = jnp.mod(ori - img.start_orientation, 2.0 * jnp.pi) / diff
    return jnp.clip(rel, 0.0, 1.0)


def _compact_rows(include: Array, fields: dict, capacity: int,
                  extra_include: Optional[Array] = None,
                  extra_capacity: int = 0):
    """Left-compact each row of (V,H) arrays by ``include``, preserving
    column order.  Returns compacted fields + per-row counts.

    All fields are packed into one (VH, C) payload and moved with a SINGLE
    scatter (destination = row·capacity + per-row rank): TPU scatters pay
    per index, not per channel, so this replaces an argsort plus one gather
    per field.

    ``extra_include`` (disjoint from ``include``) rides the SAME scatter
    into a trailing ``extra_capacity``-row block, compacted globally in
    flat pixel order — one scatter instead of two (each 28.8 K-index
    scatter costs ~0.25 ms on TPU).  Returns the extra block as a dict
    unpacked per-field (same keys/dtypes as ``fields``) + its count."""
    V, H = include.shape
    count = jnp.sum(include, axis=1).astype(jnp.int32)
    pos = jnp.cumsum(include, axis=1) - 1                   # per-row rank
    rows = jax.lax.broadcasted_iota(jnp.int32, (V, H), 0)
    total = V * capacity + extra_capacity
    dest = jnp.where(include & (pos < capacity),
                     rows * capacity + pos, total).reshape(-1)  # ⇒ dropped
    if extra_include is not None:
        eflat = extra_include.reshape(-1)
        epos = jnp.cumsum(eflat) - 1
        dest = jnp.where(eflat & (epos < extra_capacity),
                         V * capacity + epos, dest)

    packed, splits, shapes = [], [], {}
    for k, v in fields.items():
        flat = v.reshape(V * H, -1).astype(jnp.float32)
        shapes[k] = (v.dtype, v.shape[2:] if v.ndim > 2 else ())
        splits.append(flat.shape[1])
        packed.append(flat)
    payload = jnp.concatenate(packed, axis=1)               # (VH, C)
    gathered = jnp.zeros((total, payload.shape[1]), jnp.float32
                         ).at[dest].set(
        payload, mode="drop", unique_indices=True)
    extra_block = gathered[V * capacity:]
    gathered = gathered[:V * capacity].reshape(V, capacity, -1)

    out, off = {}, 0
    for k, w in zip(fields.keys(), splits):
        dtype, tail = shapes[k]
        g = gathered[:, :, off:off + w]
        out[k] = (g.reshape((V, capacity) + tail) if tail
                  else g[:, :, 0]).astype(dtype)
        off += w
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (V, capacity), 1)
    valid = pos_c < count[:, None]
    if extra_include is None:
        return out, count, valid
    # unpack the extra block with the same splits/shapes machinery so a
    # reordered or widened fields dict cannot silently misalign it
    extra_out, off = {}, 0
    for k, w in zip(fields.keys(), splits):
        dtype, tail = shapes[k]
        g = extra_block[:, off:off + w]
        extra_out[k] = (g.reshape((extra_capacity,) + tail) if tail
                        else g[:, 0]).astype(dtype)
        off += w
    extra_count = jnp.sum(extra_include).astype(jnp.int32)
    return out, count, valid, extra_out, extra_count


@functools.partial(jax.jit, static_argnames="cfg")
def segment_cloud(img: RangeImage, raw_stamp: Array,
                  cfg: LegoLoamConfig) -> ProjectionOut:
    """Full stage-1b: label, validate, and flatten into the per-ring
    segmented cloud + outlier cloud (``cloudSegmentation``,
    ``imageProjection.cpp:352-409``)."""
    from .projection import virtual_scan_2d

    V, H = img.rng.shape
    G = cfg.laser.ground_scan_index
    dec = cfg.projection.ground_decimation

    labels, segmentable = label_components(img, cfg)
    seg_ok = segment_validity(labels, segmentable, cfg)

    cols = jax.lax.broadcasted_iota(jnp.int32, (V, H), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (V, H), 0)

    ground_keep = img.ground & (
        (cols % dec == 0) | (cols <= dec) | (cols >= H - dec))
    include = seg_ok | ground_keep
    outlier_px = (segmentable & ~seg_ok & (rows > G) & (cols % dec == 0))

    rel = _relative_time(img)
    # outlier pixels (above-ground invalid segments) are DISJOINT from
    # ``include`` (seg_ok ∨ ground), so they ride the same scatter into a
    # trailing block instead of paying for a second 28.8 K-index scatter.
    O = cfg.pipeline.max_outlier
    fields, count, valid, extra_fields, out_count = _compact_rows(
        include,
        dict(xyz=img.xyz, rng=img.rng, col=cols,
             ground=img.ground, rel=rel),
        capacity=H, extra_include=outlier_px, extra_capacity=O)

    segmented = SegmentedCloud(
        xyz=fields["xyz"], rng=fields["rng"], col=fields["col"],
        is_ground=fields["ground"], valid=valid, count=count,
        rel_time=fields["rel"])

    out_xyz = extra_fields["xyz"]
    out_valid = (jnp.arange(O) < out_count)

    scan2d_xyz, scan2d_valid = virtual_scan_2d(img, cfg)

    return ProjectionOut(
        segmented=segmented,
        outlier_xyz=jnp.where(out_valid[:, None], out_xyz, 0.0),
        outlier_valid=out_valid,
        scan2d_xyz=scan2d_xyz, scan2d_valid=scan2d_valid,
        stamp=raw_stamp)


@functools.partial(jax.jit, static_argnames="cfg")
def image_projection(raw: RawScan, cfg: LegoLoamConfig) -> ProjectionOut:
    """The complete stage-1 entry point (= ``ImageProjection::cloudHandler``,
    ``imageProjection.cpp:153-174``)."""
    from .projection import project_scan

    img = project_scan(raw, cfg)
    return segment_cloud(img, raw.stamp, cfg)
