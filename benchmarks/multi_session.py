"""Multi-session replay (BASELINE.json config 5): two concatenated
sessions over the same world; the second session re-anchors to the first
session's map through loop closures.  Also validates that
checkpoint/resume splits the replay bit-exactly.

Usage: python benchmarks/multi_session.py   (TPU; one process at a time)
       OUT=MULTISESSION_r05.json python benchmarks/multi_session.py
"""
import json
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
    seed = int(os.environ.get("SEED", "3"))
    cache = f"/tmp/multisession_{seed}.npz"
    if os.path.exists(cache):
        scans, gt, times = load_sequence(cache)
        scans1, scans2 = scans[:n1], scans[n1:]
        gt1, gt2 = gt[:n1], gt[n1:]
        t1, t2 = times[:n1], times[n1:]
    else:
        (scans1, gt1, t1), (scans2, gt2, t2) = make_two_sessions(
            n1, n2, cfg, seed=seed)
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
    compile_s = time.time() - t0
    # timed steady-state pass (the first post-compile execution runs
    # several× slower than steady state — warm up once, then time)
    final_c, outs_c = replay(xyz, valid, t, cfg)
    np.asarray(outs_c["fused"][-1])
    # device->host sync: block_until_ready returns at ENQUEUE on the
    # axon tunnel backend (a bare re-run timed 0.0 s); np.asarray of an
    # output cannot complete before the computation truly finished
    xyz_p = xyz.at[0, 0].add(1e-6)
    np.asarray(xyz_p[0, :2])
    t0 = time.time()
    final_c, outs_c = replay(xyz_p, valid, t, cfg)
    np.asarray(outs_c["fused"][-1])
    elapsed = time.time() - t0
    n_total = n1 + n2
    loops = int(final_c.mapping.factor_count) \
        - (int(final_c.mapping.store.count) - 1)
    print(f"continuous 2-session replay: compile+first {compile_s:.0f}s, "
          f"timed {elapsed:.1f}s = {n_total/elapsed:.1f} scans/s, "
          f"kf={int(final_c.mapping.store.count)}, loops={loops}")

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
    m1 = ate(fused_cont[:n1], gt_rel[1:n1 + 1], align=False)

    out_path = os.environ.get("OUT", "")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({
                "benchmark": "multi_session",
                "backend": jax.default_backend(),
                "sessions": [n1, n2],
                "stamp_gap_s": 40.0,
                "scans_per_sec": round(n_total / elapsed, 1),
                "keyframes": int(final_c.mapping.store.count),
                "loop_factors": loops,
                "kf_dropped": int(final_c.mapping.meta.kf_dropped),
                "map_voxel_sat": int(final_c.mapping.meta.map_sat),
                "checkpoint_split_max_pose_diff": float(diff),
                "ate": {k: round(float(v), 4) for k, v in m.items()},
                "ate_session1": {k: round(float(v), 4)
                                 for k, v in m1.items()},
                "ate_session2": {k: round(float(v), 4)
                                 for k, v in m2.items()},
                "note": ("two sessions, same world, 40 s stamp gap; "
                         "session 2 re-anchors to session 1's map via "
                         "cross-session loop closures; split replay "
                         "resumes from an orbax-style checkpoint "
                         "bit-compatibly (max diff above)"),
            }, f, indent=1)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
