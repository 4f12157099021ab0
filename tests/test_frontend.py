"""Golden tests for stage 1: projection / ground / segmentation against a
NumPy oracle that mirrors the reference formulas (SURVEY.md §2.2)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.core.types import RawScan
from lego_loam_tpu.frontend.projection import project_scan, virtual_scan_2d
from lego_loam_tpu.frontend.segmentation import (
    image_projection, label_components, segment_validity)
from lego_loam_tpu.io.npz_io import pack_raw_scan
from lego_loam_tpu.io.synthetic import make_sequence

CFG = vlp16()


def oracle_project(points, cfg):
    """Reference projectPointCloud (imageProjection.cpp:178-224) in NumPy."""
    laser = cfg.laser
    V, H = laser.image_size
    rng_img = np.full((V, H), np.inf, np.float32)
    who = np.full((V, H), -1, np.int64)
    for i, p in enumerate(points):
        if not np.isfinite(p).all():
            continue
        r = float(np.linalg.norm(p))
        if r < 1e-12:
            continue
        vert = math.asin(np.clip(p[2] / r, -1, 1))
        row = int(math.floor((vert + laser.ang_bottom) / laser.ang_res_y))
        if row < 0 or row >= V:
            continue
        horizon = math.atan2(p[0], p[1])
        col = int(-round((horizon - math.pi / 2) / laser.ang_res_x)) + H // 2
        if col >= H:
            col -= H
        if col < 0 or col >= H:
            continue
        if r < laser.min_range:
            continue
        if r < rng_img[row, col]:
            rng_img[row, col] = r
            who[row, col] = i
    return rng_img, who


@pytest.fixture(scope="module")
def scan():
    scans, gt, times = make_sequence(1, CFG, seed=0, distortion=False)
    return scans[0]


def test_projection_matches_oracle(scan):
    raw = pack_raw_scan(scan, 0.0, CFG.pipeline.max_points)
    img = project_scan(raw, CFG)
    rng_o, who = oracle_project(scan, CFG)
    ours = np.asarray(img.rng)
    hit_o = np.isfinite(rng_o)
    hit_u = np.asarray(img.valid)
    assert (hit_o == hit_u).mean() > 0.999
    both = hit_o & hit_u
    np.testing.assert_allclose(ours[both], rng_o[both], rtol=1e-5)
    # xyz image consistent with range
    r_from_xyz = np.linalg.norm(np.asarray(img.xyz)[both], axis=-1)
    np.testing.assert_allclose(r_from_xyz, ours[both], rtol=1e-4)


def test_ground_mask_plausible(scan):
    raw = pack_raw_scan(scan, 0.0, CFG.pipeline.max_points)
    img = project_scan(raw, CFG)
    ground = np.asarray(img.ground)
    z = np.asarray(img.xyz)[..., 2]
    valid = np.asarray(img.valid)
    # ground only in rows <= ground_scan_index
    assert not ground[CFG.laser.ground_scan_index + 1:].any()
    # ground points are near the true ground plane (sensor at z=0.8)
    gz = z[ground & valid]
    assert gz.size > 1000
    assert np.percentile(np.abs(gz + 0.8), 90) < 0.3


def test_virtual_scan(scan):
    raw = pack_raw_scan(scan, 0.0, CFG.pipeline.max_points)
    img = project_scan(raw, CFG)
    xyz, valid = virtual_scan_2d(img, CFG)
    z = np.asarray(xyz)[np.asarray(valid), 2]
    assert z.size > 0
    assert (z > CFG.projection.virtual_scan_z_min - 1e-5).all()
    assert (z < CFG.projection.virtual_scan_z_max + 1e-5).all()


def oracle_components(rng_img, segmentable, cfg):
    """BFS connected components with the merge criterion — the reference's
    labelComponents (imageProjection.cpp:412-496) reachability."""
    V, H = rng_img.shape
    theta = math.tan(math.radians(cfg.projection.segment_theta_deg))
    labels = np.full((V, H), -1, np.int64)
    comp = 0
    for si in range(V):
        for sj in range(H):
            if not segmentable[si, sj] or labels[si, sj] >= 0:
                continue
            stack = [(si, sj)]
            labels[si, sj] = comp
            while stack:
                i, j = stack.pop()
                for di, dj, alpha in ((0, 1, cfg.laser.ang_res_x),
                                      (0, -1, cfg.laser.ang_res_x),
                                      (1, 0, cfg.laser.ang_res_y),
                                      (-1, 0, cfg.laser.ang_res_y)):
                    ni, nj = i + di, (j + dj) % H
                    if ni < 0 or ni >= V or not segmentable[ni, nj] \
                            or labels[ni, nj] >= 0:
                        continue
                    d1 = max(rng_img[i, j], rng_img[ni, nj])
                    d2 = min(rng_img[i, j], rng_img[ni, nj])
                    tang = d2 * math.sin(alpha) / (d1 - d2 * math.cos(alpha))
                    if tang > theta:
                        labels[ni, nj] = comp
                        stack.append((ni, nj))
            comp += 1
    return labels


def test_label_components_match_bfs(scan):
    raw = pack_raw_scan(scan, 0.0, CFG.pipeline.max_points)
    img = project_scan(raw, CFG)
    labels, segmentable = label_components(img, CFG)
    labels = np.asarray(labels)
    segmentable_np = np.asarray(segmentable)
    oracle = oracle_components(np.asarray(img.rng), segmentable_np, CFG)

    # same partition: our labels (min flat index) must biject with BFS comps
    ours = labels[segmentable_np]
    ref = oracle[segmentable_np]
    # map each reference comp to our label; must be 1:1 both ways
    pairs = set(zip(ref.tolist(), ours.tolist()))
    assert len(pairs) == len(set(ref.tolist()))
    assert len(pairs) == len(set(ours.tolist()))


def test_image_projection_end_to_end(scan):
    raw = pack_raw_scan(scan, 0.0, CFG.pipeline.max_points)
    out = image_projection(raw, CFG)
    seg = out.segmented
    counts = np.asarray(seg.count)
    assert counts.sum() > 500            # a real outdoor scan segments well
    valid = np.asarray(seg.valid)
    # compaction: valid prefix per ring
    for i in range(valid.shape[0]):
        n = counts[i]
        assert valid[i, :n].all() and not valid[i, n:].any()
    # ranges of valid segmented points are positive and finite
    r = np.asarray(seg.rng)[valid]
    assert np.isfinite(r).all() and (r > 0).all()


def test_compact_rows_extra_block():
    """_compact_rows with extra_include: per-field unpacking, flat-order
    compaction, disjointness from the row block, overflow drop."""
    from lego_loam_tpu.frontend.segmentation import _compact_rows

    rng = np.random.default_rng(7)
    V, H = 4, 12
    xyz = rng.normal(size=(V, H, 3)).astype(np.float32)
    rngf = rng.uniform(1, 30, size=(V, H)).astype(np.float32)
    cols = np.broadcast_to(np.arange(H, dtype=np.int32), (V, H)).copy()
    include = rng.uniform(size=(V, H)) < 0.4
    extra = (~include) & (rng.uniform(size=(V, H)) < 0.3)
    assert not np.any(include & extra)

    cap, ecap = H, 8
    fields = dict(xyz=jnp.asarray(xyz), rng=jnp.asarray(rngf),
                  col=jnp.asarray(cols))
    out, count, valid, extra_out, extra_count = _compact_rows(
        jnp.asarray(include), fields, capacity=cap,
        extra_include=jnp.asarray(extra), extra_capacity=ecap)

    # row block: column order preserved per row, all fields aligned
    for i in range(V):
        sel = np.where(include[i])[0]
        assert int(count[i]) == len(sel)
        np.testing.assert_allclose(np.asarray(out["xyz"])[i, :len(sel)],
                                   xyz[i, sel], rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(out["col"])[i, :len(sel)],
                                      cols[i, sel])

    # extra block: global flat-pixel order, per-field dtypes/shapes
    eflat = np.where(extra.reshape(-1))[0]
    n_fit = min(len(eflat), ecap)
    assert int(extra_count) == len(eflat)
    assert extra_out["xyz"].shape == (ecap, 3)
    assert extra_out["col"].dtype == jnp.int32
    np.testing.assert_allclose(
        np.asarray(extra_out["xyz"])[:n_fit],
        xyz.reshape(-1, 3)[eflat[:n_fit]], rtol=0, atol=0)
    np.testing.assert_array_equal(
        np.asarray(extra_out["col"])[:n_fit],
        cols.reshape(-1)[eflat[:n_fit]])


def test_compact_rows_extra_overflow():
    """extra_capacity overflow: first `ecap` pixels in flat order kept,
    the rest dropped (no wraparound corruption)."""
    from lego_loam_tpu.frontend.segmentation import _compact_rows

    V, H, ecap = 2, 10, 3
    vals = np.arange(V * H, dtype=np.float32).reshape(V, H)
    include = np.zeros((V, H), bool)
    extra = np.ones((V, H), bool)            # 20 > ecap=3
    out, count, valid, extra_out, extra_count = _compact_rows(
        jnp.asarray(include), dict(v=jnp.asarray(vals)), capacity=H,
        extra_include=jnp.asarray(extra), extra_capacity=ecap)
    assert int(extra_count) == V * H         # true count reported
    np.testing.assert_array_equal(np.asarray(extra_out["v"]),
                                  vals.reshape(-1)[:ecap])
    assert int(count.sum()) == 0 and not bool(np.asarray(valid).any())
