"""Driver CLI — the ``roslaunch lego_loam_bor run.launch rosbag:=…``
equivalent (``main.cpp:11-112``, ``launch/run.launch``).

Offline (default): whole-sequence compiled replay (`lax.scan`), max
device speed — the BOR fork's deterministic bag mode.

Streaming (``--streaming``): scans flow through the native bounded
channel (depth 1 ⇒ lock-step, like ``projection_out_channel``) into
per-scan `slam_step` calls — the live-topic mode, at sensor rate or as
fast as the producer sends.

Examples:
  python -m lego_loam_tpu.run --input seq.npz --output out/
  python -m lego_loam_tpu.run --synthetic 300 --output out/ --config cfg.yaml
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input",
                    help=".npz sequence (io.npz_io format) or ROS1 .bag "
                         "of sensor_msgs/PointCloud2")
    ap.add_argument("--topic", default=None,
                    help="PointCloud2 topic for .bag input (default: any; "
                         "the reference's lidar_topic param, main.cpp:21)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic scans instead of --input")
    ap.add_argument("--output", default="artifacts",
                    help="artifact directory")
    ap.add_argument("--config", help="reference-style YAML config")
    ap.add_argument("--odometry-only", action="store_true")
    ap.add_argument("--streaming", action="store_true",
                    help="per-scan streaming through the native channel")
    ap.add_argument("--publish-every", type=int, default=10, metavar="N",
                    help="streaming mode: emit map snapshots every Nth "
                         "mapping cycle (reference cadence: 10, "
                         "mapOptmization.cpp:1562-1568); 0 disables")
    ap.add_argument("--debug-scan", type=int, default=None, metavar="I",
                    help="also dump per-scan frontend debug clouds for "
                         "scan I (the reference's rviz topics, as .npz)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from .core import se3
    from .core.config import vlp16
    from .core.params import config_from_yaml
    from .eval.artifacts import (StageTimer, dump_map_artifacts,
                                 dump_run_artifacts)
    from .eval.metrics import ate
    from .io.npz_io import load_sequence, pack_sequence

    cfg = config_from_yaml(args.config) if args.config else vlp16()
    if args.odometry_only:
        cfg = cfg.replace(pipeline=dataclasses.replace(
            cfg.pipeline, odometry_only=True))

    if args.synthetic:
        from .io.synthetic import make_sequence
        scans, gt, times = make_sequence(args.synthetic, cfg,
                                         seed=args.seed, noise=0.01)
    elif args.input and args.input.endswith(".bag"):
        from .io.rosbag import load_bag
        scans, gt, times = load_bag(args.input, topic=args.topic)
    elif args.input:
        scans, gt, times = load_sequence(args.input)
    else:
        ap.error("need --input or --synthetic")

    n = len(scans)
    print(f"[lego-loam-tpu] {n} scans, backend={jax.default_backend()}",
          file=sys.stderr)

    timer = StageTimer()
    if args.streaming:
        from .core.types import RawScan
        from .io.native_feeder import ScanChannel
        from .pipeline.slam import init_state, slam_step

        ch = ScanChannel(cfg.pipeline.max_points, depth=1)

        def produce():
            for i, pts in enumerate(scans):
                ch.send(pts, float(times[i]))
            ch.close()

        threading.Thread(target=produce, daemon=True).start()

        state = init_state(cfg)
        fused_list = []
        publish_scans = (args.publish_every
                         * cfg.mapping.mapping_frequency_divider)
        t0 = time.time()
        i = 0
        while True:
            item = ch.recv()
            if item is None:
                break
            xyz, valid, stamp = item
            t1 = time.time()
            raw = RawScan(xyz=jnp.asarray(xyz), valid=jnp.asarray(valid),
                          stamp=jnp.float32(stamp))
            state, out = slam_step(state, raw, cfg)
            fused_list.append(np.asarray(out["fused"]))
            timer.add("slam_step", time.time() - t1)
            i += 1
            # runtime-cadence map publication (every 10th mapping cycle,
            # mapOptmization.cpp:1562-1568) — observability DURING the run
            if args.publish_every and i % publish_scans == 0:
                t1 = time.time()
                dump_map_artifacts(args.output, state, cfg, suffix="_live")
                timer.add("publish_map", time.time() - t1)
        wall = time.time() - t0
        outs = {"fused": np.asarray(fused_list)}
        final_state = state
    else:
        from .pipeline.slam import replay

        xyz, valid, t = pack_sequence(scans, times, cfg)
        t0 = time.time()
        final_state, outs = replay(xyz, valid, t, cfg)
        jax.block_until_ready(outs)
        timer.add("compile+replay", time.time() - t0)
        t0 = time.time()
        final_state, outs = replay(xyz, valid, t, cfg)
        jax.block_until_ready(outs)
        wall = time.time() - t0
        timer.add("replay", wall)

    rate = n / wall
    speed_x = rate * cfg.laser.scan_period
    print(f"[lego-loam-tpu] processed at {speed_x:.1f}X sensor speed "
          f"({rate:.1f} scans/s)", file=sys.stderr)

    metrics = {"scans_per_sec": round(rate, 2),
               "realtime_factor": round(speed_x, 2),
               "stages": timer.summary()}
    if not cfg.pipeline.odometry_only:
        kf_drop = int(final_state.mapping.meta.kf_dropped)
        f_drop = int(final_state.mapping.meta.factor_dropped)
        m_sat = int(final_state.mapping.meta.map_sat)
        metrics["kf_dropped"] = kf_drop
        metrics["factor_dropped"] = f_drop
        metrics["map_voxel_sat"] = m_sat
        if kf_drop or f_drop:
            print(f"[lego-loam-tpu] WARNING: capacity saturated — "
                  f"{kf_drop} keyframes / {f_drop} factors dropped; "
                  f"raise mapping.max_keyframes / max_loop_factors",
                  file=sys.stderr)
        if m_sat:
            print(f"[lego-loam-tpu] WARNING: world-frame voxel filters "
                  f"truncated {m_sat} voxels (map censored at an "
                  f"x-plane); raise mapping.max_map_corner/max_map_surf/"
                  f"loop_history_cap", file=sys.stderr)
    if gt is not None:
        gt_j = jnp.asarray(gt)
        gt_rel = np.asarray(jax.vmap(
            lambda g: se3.relative(gt_j[0], g))(gt_j))
        fused = np.asarray(outs["fused"])
        m = ate(fused[:-1], gt_rel[1:len(fused)], align=False)
        metrics["ate"] = m
        print(f"[lego-loam-tpu] ATE rmse {m['rmse']:.3f} m",
              file=sys.stderr)

    dump_run_artifacts(args.output, outs, times, final_state, cfg,
                       gt_poses=gt, metrics=metrics)
    if args.debug_scan is not None:
        from .eval.artifacts import dump_scan_debug
        from .io.npz_io import pack_raw_scan
        i = min(args.debug_scan, n - 1)
        raw = pack_raw_scan(scans[i], float(times[i]),
                            cfg.pipeline.max_points)
        path = dump_scan_debug(args.output, raw, cfg, index=i)
        print(f"[lego-loam-tpu] debug clouds -> {path}", file=sys.stderr)
    print(json.dumps(metrics.get("ate", {"scans_per_sec": rate})))


if __name__ == "__main__":
    main()
