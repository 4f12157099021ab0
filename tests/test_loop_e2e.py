"""End-to-end loop closure regression (shrunken geometry so it runs on
the CPU test backend in minutes)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.eval.metrics import ate
from lego_loam_tpu.io.npz_io import pack_sequence
from lego_loam_tpu.io.synthetic import make_sequence
from lego_loam_tpu.pipeline.slam import replay


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_LOOP_E2E"),
    reason="~10 min on the CPU test backend; run explicitly with "
           "RUN_LOOP_E2E=1 (the TPU verify drive covers this path)")
def test_loop_closure_fires_and_bounds_drift():
    cfg = vlp16()
    # shrink the time gap so a 12 s lap revisits "long after"; shrink the
    # ICP capacities/iterations so this runs on the CPU test backend
    cfg = cfg.replace(mapping=dataclasses.replace(
        cfg.mapping, loop_closure_time_gap=6.0,
        loop_history_cap=8192, loop_source_cap=2048, icp_max_iters=25))

    n = 140                                   # ~1.15 laps
    scans, gt, times = make_sequence(n, cfg, seed=33, noise=0.01,
                                     radius=2.5, speed=1.3)
    xyz, valid, t = pack_sequence(scans, times, cfg)
    final, outs = replay(xyz, valid, t, cfg)

    kf = int(final.mapping.store.count)
    factors = int(final.mapping.factor_count)
    assert kf > 10
    # at least one loop factor beyond the odometry chain
    assert factors >= kf, (kf, factors)

    fused = np.asarray(outs["fused"])
    gt_j = jnp.asarray(gt)
    gt_rel = np.asarray(jax.vmap(lambda g: se3.relative(gt_j[0], g))(gt_j))
    m = ate(fused[:-1], gt_rel[1:n], align=False)
    assert np.isfinite(fused).all()
    assert m["rmse"] < 0.5, m
