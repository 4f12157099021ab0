"""IO subsystems: npz round-trip, YAML params, checkpoint/resume,
occupancy grid from a keyframe store."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.core.config import vlp16, hdl64
from lego_loam_tpu.core.params import config_from_dict
from lego_loam_tpu.io.checkpoint import load_state, save_state
from lego_loam_tpu.io.npz_io import (load_sequence, pack_sequence,
                                     save_sequence)

CFG = vlp16()


def test_npz_roundtrip(tmp_path, small_sequence):
    scans, gt, times = small_sequence
    p = str(tmp_path / "seq.npz")
    save_sequence(p, scans[:3], gt[:3], times[:3])
    s2, g2, t2 = load_sequence(p)
    assert len(s2) == 3
    np.testing.assert_allclose(s2[0], scans[0])
    np.testing.assert_allclose(g2, gt[:3])


def test_config_from_reference_yaml_names():
    cfg = config_from_dict({
        "lego_loam": {
            "laser": {"num_vertical_scans": 32, "scan_period": 0.05},
            "imageProjection": {"segment_theta": 45.0},
            "featureAssociation": {"edge_threshold": 0.2},
            "mapping": {"enable_loop_closure": False,
                        "mapping_frequency_divider": 3},
        }
    })
    assert cfg.laser.num_vertical_scans == 32
    assert cfg.laser.scan_period == 0.05
    assert cfg.projection.segment_theta_deg == 45.0
    assert cfg.feature.edge_threshold == 0.2
    assert not cfg.mapping.enable_loop_closure
    assert cfg.mapping.mapping_frequency_divider == 3
    # untouched defaults survive
    assert cfg.laser.num_horizontal_scans == 1800


def test_config_rejects_unknown_keys():
    with pytest.raises(KeyError):
        config_from_dict({"laser": {"numb_vertical_scans": 16}})


def test_checkpoint_roundtrip(tmp_path, small_sequence):
    from lego_loam_tpu.pipeline.slam import init_state, replay

    scans, gt, times = small_sequence
    xyz, valid, t = pack_sequence(scans[:6], times[:6], CFG)
    state, _ = replay(xyz, valid, t, CFG)

    p = str(tmp_path / "ckpt.npz")
    save_state(p, state)
    restored = load_state(p, init_state(CFG))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming from the checkpoint continues identically
    from lego_loam_tpu.core.types import RawScan
    from lego_loam_tpu.pipeline.slam import slam_step
    xyz2, valid2, t2 = pack_sequence(scans[6:8], times[6:8], CFG)
    raw = RawScan(xyz=xyz2[0].reshape(-1, 3), valid=valid2[0],
                  stamp=t2[0])
    s_a, out_a = slam_step(state, raw, CFG)
    s_b, out_b = slam_step(restored, raw, CFG)
    np.testing.assert_array_equal(np.asarray(out_a["fused"]),
                                  np.asarray(out_b["fused"]))


def test_checkpoint_rejects_mismatched_template(tmp_path):
    import dataclasses

    from lego_loam_tpu.pipeline.slam import init_state

    state = init_state(CFG)
    p = str(tmp_path / "ckpt.npz")
    save_state(p, state)
    other = CFG.replace(mapping=dataclasses.replace(
        CFG.mapping, max_keyframes=128))
    with pytest.raises(ValueError):
        load_state(p, init_state(other))


def test_occupancy_grid_from_pipeline(small_sequence):
    from lego_loam_tpu.map2d.grid import build_occupancy_grid
    from lego_loam_tpu.pipeline.slam import replay

    scans, gt, times = small_sequence
    xyz, valid, t = pack_sequence(scans, times, CFG)
    state, _ = replay(xyz, valid, t, CFG)
    assert int(state.mapping.store.count) >= 1
    grid, origin = build_occupancy_grid(
        state.mapping.store, jnp.zeros(6, jnp.float32), CFG,
        max_frames=8)
    g = np.asarray(grid)
    G = CFG.grid2d
    assert g.shape == (G.max_cells, G.max_cells)
    assert (g > G.unknown).sum() > 0        # some occupied cells
    assert (g < G.unknown).sum() > 100      # free space carved out


def test_hdl64_config_projection():
    """KITTI 64-beam geometry config exercises the projection shapes
    (BASELINE.json config 4)."""
    from lego_loam_tpu.frontend.projection import project_scan
    from lego_loam_tpu.io.npz_io import pack_raw_scan
    from lego_loam_tpu.io.synthetic import make_sequence

    cfg = hdl64()
    scans, gt, times = make_sequence(1, cfg, seed=2, distortion=False)
    raw = pack_raw_scan(scans[0], 0.0, cfg.pipeline.max_points)
    img = project_scan(raw, cfg)
    assert img.rng.shape == (64, 2083)
    assert int(np.asarray(img.valid).sum()) > 20000


def test_chunked_replay_from_matches_whole():
    """ADVICE r3: the chunked long-sequence driver (replay → two
    replay_from calls with the state carried across) must be bit-equal
    to one whole-sequence replay — this is what lets the 20 K-scan
    Stevens feed fixed-shape chunks (benchmarks/stevens_stress.py)."""
    from tests.test_distributed import _tiny_cfg
    from lego_loam_tpu.io.synthetic import make_sequence
    from lego_loam_tpu.pipeline.slam import init_state, replay, replay_from

    cfg = _tiny_cfg()
    n = 6
    scans, gt, times = make_sequence(n, cfg, seed=9, noise=0.01)
    xyz, valid, t = pack_sequence(scans, times, cfg)

    whole_state, whole_out = replay(xyz, valid, t, cfg)

    state = init_state(cfg)
    fused = []
    for c0 in (0, 3):
        state, outs = replay_from(state, xyz[c0:c0 + 3], valid[c0:c0 + 3],
                                  t[c0:c0 + 3], cfg)
        fused.append(np.asarray(outs["fused"]))
    np.testing.assert_array_equal(np.concatenate(fused),
                                  np.asarray(whole_out["fused"]))
    for a, b in zip(jax.tree_util.tree_leaves(whole_state),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_odometry_reanchor_invariant():
    """Gimbal-singularity guard (pipeline/slam.py): after a scan where
    mapping ran, the stored odometry integration and bef_mapped are both
    re-anchored to the mapped pose, so the Euler attitude of the
    integration can never random-walk into the pitch=±90° absorbing
    state (measured at scan ~9000 of the 20 K Stevens run)."""
    from tests.test_distributed import _tiny_cfg
    from lego_loam_tpu.io.synthetic import make_sequence
    from lego_loam_tpu.pipeline.slam import replay

    cfg = _tiny_cfg()
    div = cfg.mapping.mapping_frequency_divider
    n = div  # mapping runs exactly on the last scan
    scans, gt, times = make_sequence(n, cfg, seed=4, noise=0.01)
    xyz, valid, t = pack_sequence(scans, times, cfg)
    final, outs = replay(xyz, valid, t, cfg)
    odom = np.asarray(final.odo.odom)
    bef = np.asarray(final.mapping.meta.bef_mapped)
    aft = np.asarray(final.mapping.meta.aft_mapped)
    np.testing.assert_array_equal(odom, bef)
    np.testing.assert_array_equal(odom, aft)
