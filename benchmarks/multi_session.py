"""Multi-session replay (BASELINE.json config 5): two concatenated
sessions over the same world; the second session re-anchors to the first
session's map through loop closures.  Also validates that
checkpoint/resume splits the replay bit-exactly.

Usage: python benchmarks/multi_session.py   (TPU; one process at a time)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.core.types import RawScan
from lego_loam_tpu.eval.metrics import ate
from lego_loam_tpu.io.checkpoint import load_state, save_state
from lego_loam_tpu.io.npz_io import pack_sequence, save_sequence, \
    load_sequence
from lego_loam_tpu.io.synthetic import default_world, circle_trajectory, \
    simulate_scan
from lego_loam_tpu.pipeline.slam import init_state, replay, slam_step


def make_two_sessions(n1, n2, cfg, seed=7):
    """Same world; session 2 starts where session 1 ended in TIME (gap in
    stamps) but retraces the same circle — pure revisit."""
    gt1, t1, pose_fn = circle_trajectory(n1, radius=6.5, speed=1.3,
                                         period=cfg.laser.scan_period)
    # keep the whole lap clear of world geometry (see default_world)
    full = pose_fn(np.arange(0, 2 * np.pi * 6.5 / 1.3 + 0.1,
                             cfg.laser.scan_period))
    world = default_world(seed, path_xy=full[:, 3:5])
    scans1 = [simulate_scan(pose_fn, t, cfg, world, noise=0.01,
                            seed=seed + i) for i, t in enumerate(t1)]
    # session 2: same trajectory function, shifted in time by 2 lap gaps
    t_off = n1 * cfg.laser.scan_period + 40.0
    t2 = np.arange(n2) * cfg.laser.scan_period + t_off
    gt2 = np.stack([pose_fn(t - t_off) for t in t2])
    scans2 = [simulate_scan(lambda tt: pose_fn(tt - t_off), t, cfg, world,
                            noise=0.01, seed=seed + n1 + i)
              for i, t in enumerate(t2)]
    return (scans1, gt1, t1), (scans2, gt2, t2)


def main():
    cfg = vlp16()
    cache = "/tmp/multisession.npz"
    # session 1 = one full lap (2π·6.5/1.3 ≈ 31.4 s) so session 2's start
    # coincides with session 1's end — neither the reference nor this
    # engine has global relocalization, so sessions must be spatially
    # contiguous; the 40 s stamp gap still exercises the loop-closure
    # time gate across sessions.
    n1, n2 = 314, 200
    if os.path.exists(cache):
        scans, gt, times = load_sequence(cache)
        scans1, scans2 = scans[:n1], scans[n1:]
        gt1, gt2 = gt[:n1], gt[n1:]
        t1, t2 = times[:n1], times[n1:]
    else:
        (scans1, gt1, t1), (scans2, gt2, t2) = make_two_sessions(
            n1, n2, cfg)
        save_sequence(cache, scans1 + scans2,
                      np.concatenate([gt1, gt2]).astype(np.float32),
                      np.concatenate([t1, t2]).astype(np.float32))

    # --- continuous replay of both sessions
    all_scans = scans1 + scans2
    all_times = np.concatenate([t1, t2])
    xyz, valid, t = pack_sequence(all_scans, all_times, cfg)
    t0 = time.time()
    final_c, outs_c = replay(xyz, valid, t, cfg)
    jax.block_until_ready(outs_c)
    print(f"continuous 2-session replay: {time.time()-t0:.0f}s, "
          f"kf={int(final_c.mapping.store.count)}, "
          f"loops={int(final_c.mapping.factor_count) - (int(final_c.mapping.store.count)-1)}")

    # --- checkpointed split replay: session 1, save, load, session 2
    xyz1, valid1, tt1 = pack_sequence(scans1, t1, cfg)
    s1, outs1 = replay(xyz1, valid1, tt1, cfg)
    jax.block_until_ready(outs1)
    save_state("/tmp/session1.ckpt.npz", s1)
    restored = load_state("/tmp/session1.ckpt.npz", init_state(cfg))

    state = restored
    fused2 = []
    for i in range(n2):
        raw_xyz, raw_valid, _ = pack_sequence([scans2[i]], [t2[i]], cfg)
        raw = RawScan(xyz=raw_xyz[0].reshape(-1, 3), valid=raw_valid[0],
                      stamp=jnp.float32(t2[i]))
        state, out = slam_step(state, raw, cfg)
        fused2.append(np.asarray(out["fused"]))
    fused_split = np.concatenate([np.asarray(outs1["fused"]),
                                  np.asarray(fused2)])
    fused_cont = np.asarray(outs_c["fused"])
    diff = np.abs(fused_split - fused_cont).max()
    print(f"checkpoint-split vs continuous max pose diff: {diff:.2e}")

    gt_all = np.concatenate([gt1, gt2]).astype(np.float32)
    gt_j = jnp.asarray(gt_all)
    gt_rel = np.asarray(jax.vmap(lambda g: se3.relative(gt_j[0], g))(gt_j))
    m = ate(fused_cont[:-1], gt_rel[1:len(fused_cont)], align=False)
    print("2-session ATE:", {k: round(v, 3) for k, v in m.items()})
    m2 = ate(fused_cont[n1:-1], gt_rel[n1 + 1:len(fused_cont)],
             align=False)
    print("session-2-only ATE:", {k: round(v, 3) for k, v in m2.items()})


if __name__ == "__main__":
    main()
