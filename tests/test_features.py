import numpy as np
import jax.numpy as jnp
import pytest

from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.frontend.features import extract_features
from lego_loam_tpu.frontend.segmentation import image_projection
from lego_loam_tpu.io.npz_io import pack_raw_scan
from lego_loam_tpu.match.voxelhash import voxel_downsample

CFG = vlp16()


def test_voxel_downsample_oracle():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    valid = np.ones(500, bool)
    valid[450:] = False
    leaf = 0.5
    out_xyz, out_valid = voxel_downsample(
        jnp.asarray(pts), jnp.asarray(valid), leaf, 1024)
    out_xyz = np.asarray(out_xyz)[np.asarray(out_valid)]

    # oracle: centroid per occupied voxel
    keys = np.floor(pts[:450] / leaf).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    cents = np.zeros((len(uniq), 3))
    for i in range(len(uniq)):
        cents[i] = pts[:450][inv == i].mean(axis=0)
    assert out_xyz.shape[0] == len(uniq)
    # match as sets
    order_a = np.lexsort(out_xyz.T)
    order_b = np.lexsort(cents.T)
    np.testing.assert_allclose(out_xyz[order_a], cents[order_b], atol=1e-4)


def test_voxel_downsample_capacity_clip():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3) * 10.0
    out_xyz, out_valid = voxel_downsample(
        jnp.asarray(pts), jnp.ones(10, bool), 0.1, 4)
    assert int(np.asarray(out_valid).sum()) == 4


@pytest.fixture(scope="module")
def proj_out(small_sequence):
    scans, gt, times = small_sequence
    raw = pack_raw_scan(scans[0], 0.0, CFG.pipeline.max_points)
    return image_projection(raw, CFG)


def test_extract_features_counts(proj_out):
    fs = extract_features(proj_out.segmented, CFG)
    f = CFG.feature
    n_sharp = int(np.asarray(fs.sharp.valid).sum())
    n_less_sharp = int(np.asarray(fs.less_sharp.valid).sum())
    n_flat = int(np.asarray(fs.flat.valid).sum())
    n_less_flat = int(np.asarray(fs.less_flat.valid).sum())
    V = CFG.laser.num_vertical_scans
    assert 0 < n_sharp <= f.sharp_per_sector * f.num_sectors * V
    assert n_sharp <= n_less_sharp
    assert 0 < n_flat <= f.flat_per_sector * f.num_sectors * V
    assert n_less_flat > n_flat
    # flat features are ground points near plane z=-0.8
    flat_xyz = np.asarray(fs.flat.xyz)[np.asarray(fs.flat.valid)]
    assert np.percentile(np.abs(flat_xyz[:, 2] + 0.8), 80) < 0.3
    # sharp features are not ground
    sharp_xyz = np.asarray(fs.sharp.xyz)[np.asarray(fs.sharp.valid)]
    assert (sharp_xyz[:, 2] > -0.5).mean() > 0.9


def test_feature_curvature_ordering(proj_out):
    """Sharp features must have high curvature, flat low, per ring/sector."""
    from lego_loam_tpu.frontend.features import compute_curvature
    seg = proj_out.segmented
    curv = np.asarray(compute_curvature(seg))
    fs = extract_features(seg, CFG)
    # locate each sharp feature in the segmented cloud and check threshold
    seg_xyz = np.asarray(seg.xyz).reshape(-1, 3)
    c_flat = curv.reshape(-1)
    sharp_xyz = np.asarray(fs.sharp.xyz)[np.asarray(fs.sharp.valid)]
    for p in sharp_xyz[:20]:
        d = np.linalg.norm(seg_xyz - p, axis=1)
        j = int(np.argmin(d))
        assert d[j] < 1e-5
        assert c_flat[j] > CFG.feature.edge_threshold


def test_suppression_prefix_sum_matches_walk(proj_out):
    """The prefix-sum gap-break suppression must match the reference's
    sequential ±5 walk exactly."""
    import jax.numpy as jnp
    from lego_loam_tpu.frontend.features import _gap_prefix

    seg = proj_out.segmented
    col = np.asarray(seg.col)
    valid = np.asarray(seg.valid)
    badcum = np.asarray(_gap_prefix(
        jnp.asarray(col), jnp.asarray(valid), CFG.feature.occlusion_col_diff))
    V, S = col.shape
    rng = np.random.default_rng(0)
    for _ in range(200):
        v = rng.integers(0, V)
        n = valid[v].sum()
        if n < 12:
            continue
        idx = int(rng.integers(5, n - 6))

        # oracle: the reference walk (featureAssociation.cpp:306-326)
        walk = {idx}
        for l in range(1, 6):
            if idx + l >= S:
                break
            if abs(int(col[v, idx + l]) - int(col[v, idx + l - 1])) > 10:
                break
            walk.add(idx + l)
        for l in range(1, 6):
            if idx - l < 0:
                break
            if abs(int(col[v, idx - l]) - int(col[v, idx - l + 1])) > 10:
                break
            walk.add(idx - l)

        pos = np.arange(S)
        ours = set(np.nonzero(
            (np.abs(pos - idx) <= 5) & (badcum[v] == badcum[v, idx])
            & valid[v])[0].tolist())
        walk = {p for p in walk if valid[v, p]}
        assert ours == walk, (v, idx, sorted(ours ^ walk))


def test_feature_cloud_layout_invariants(proj_out):
    """Feature clouds must be left-compacted in flat-pixel order with
    unique pixels — the trajectory is chaotically sensitive to candidate
    order (kNN tie-breaks), so the layout is pinned by contract."""
    seg = proj_out.segmented
    fs = extract_features(seg, CFG)
    seg_xyz = np.asarray(seg.xyz)
    V, S = np.asarray(seg.rng).shape
    for fc in (fs.sharp, fs.less_sharp, fs.flat):
        valid = np.asarray(fc.valid)
        n = int(valid.sum())
        assert n > 0
        # left-compacted: all valid entries first
        assert valid[:n].all() and not valid[n:].any()
        ring = np.asarray(fc.ring)[:n].astype(int)
        xyz = np.asarray(fc.xyz)[:n]
        # each point matches its source pixel; recover the column by
        # exact xyz match within the ring row
        flat_keys = []
        for i in range(n):
            row = seg_xyz[ring[i]]
            d = np.linalg.norm(row - xyz[i], axis=1)
            j = int(np.argmin(d))
            assert d[j] < 1e-6
            flat_keys.append(ring[i] * S + j)
        # strictly increasing flat index = position-major order + unique
        assert all(b > a for a, b in zip(flat_keys, flat_keys[1:]))


def test_voxel_downsample_saturation_semantics():
    """Saturation truncates in voxel-key (x-major) order: the lowest-key
    voxels survive exactly.  This is load-bearing: on sensor-frame scan
    clouds it acts as a forward-range cap (ATE-positive — r2 A/B:
    Stevens 3.2 m vs 29-48 m for uniform-drop/merge policies); WORLD-
    frame aggregate capacities must therefore be sized to never
    saturate (see voxelhash.py docstring and loop/detect.py)."""
    from lego_loam_tpu.match.voxelhash import voxel_downsample

    rng = np.random.default_rng(5)
    n, cap = 2048, 256
    xyz = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    out, ok = voxel_downsample(jnp.asarray(xyz), jnp.asarray(valid),
                               leaf=0.4, capacity=cap)
    pts = np.asarray(out)[np.asarray(ok)]
    assert len(pts) == cap                      # fully used
    # survivors are exactly the lowest-x-key voxels
    key = np.floor(xyz / 0.4)
    order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    cut = np.sort(pts[:, 0])[-1]
    assert pts[:, 0].max() <= np.sort(np.unique(key[:, 0]))[-1] * 0.4 + 0.4
    # unsaturated path: grid-aligned duplicates collapse to exact
    # centroids
    small = np.array([[1.0, 1.0, 1.0], [1.05, 1.05, 1.05],
                      [5.0, 5.0, 5.0]], np.float32)
    out2, ok2 = voxel_downsample(jnp.asarray(small),
                                 jnp.ones(3, bool), 0.4, 8)
    got = np.asarray(out2)[np.asarray(ok2)]
    assert len(got) == 2
    np.testing.assert_allclose(sorted(got[:, 0]), [1.025, 5.0], atol=1e-6)


def test_blocked_picks_match_compact_layout(proj_out):
    """With odom_band_rings on, pick clouds ship RING-BLOCKED
    (`_blocked_from_picks`): same pick SET as the compact layout, block
    r holding exactly ring r's picks in ascending column order with
    invalids last (the banded solver's layout contract,
    `match/banded.py`)."""
    import dataclasses

    seg = proj_out.segmented
    f = CFG.feature
    V = CFG.laser.num_vertical_scans
    cfg_b = CFG.replace(feature=dataclasses.replace(
        f, odom_band_rings=4,
        max_sharp=V * f.sharp_per_sector * f.num_sectors,
        max_less_sharp=V * f.less_sharp_per_sector * f.num_sectors,
        max_flat=V * f.flat_per_sector * f.num_sectors))
    fs_c = extract_features(seg, CFG)
    fs_b = extract_features(seg, cfg_b)

    for fc, fb in ((fs_c.sharp, fs_b.sharp),
                   (fs_c.less_sharp, fs_b.less_sharp),
                   (fs_c.flat, fs_b.flat)):
        cap = fb.valid.shape[0] // V
        vb = np.asarray(fb.valid).reshape(V, cap)
        xb = np.asarray(fb.xyz).reshape(V, cap, 3)
        rb = np.asarray(fb.ring).reshape(V, cap)
        vc = np.asarray(fc.valid)
        xc = np.asarray(fc.xyz)[vc]
        rc = np.asarray(fc.ring)[vc].astype(int)
        assert int(vb.sum()) == len(xc)
        for r in range(V):
            # block r holds ring r's picks, valid-first
            n = int(vb[r].sum())
            assert vb[r, :n].all() and not vb[r, n:].any()
            assert (rb[r, :n].astype(int) == r).all()
            ours = xb[r, :n]
            want = xc[rc == r]          # compact is position-major
            np.testing.assert_allclose(ours, want, atol=0)
