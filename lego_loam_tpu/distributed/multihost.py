"""Multi-host distributed runtime (``jax.distributed`` + global mesh).

The reference has no distributed communication backend at all — its only
transport is an in-process ``Channel<T>`` plus ROS topics (SURVEY.md
§2.1/§5).  This module is the mandated new axis: N processes (one per
host) join a ``jax.distributed`` coordination service, their local
devices form one GLOBAL mesh, and the same sharded code paths
(``replay_sharded`` data parallelism, ``optimize_poses_sharded`` factor
psums) run across hosts — collectives ride ICI within a slice and DCN
across slices, with zero code changes.

Worker entry point (used by ``tests/test_multihost.py`` and
``benchmarks/scaling.py --hosts N``; CPU "fake hosts" per SURVEY §4 —
local multi-process with virtual devices)::

    python -m lego_loam_tpu.distributed.multihost \
        --coordinator localhost:12345 --num-processes 2 --process-id 0 \
        --out /tmp/mh0.npz
"""

from __future__ import annotations

import argparse
import os
import sys


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_ids=None) -> None:
    """Join the jax.distributed coordination service (idempotent)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def global_mesh(axis: str = "data"):
    """One mesh over every device of every process."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), axis_names=(axis,))


def _psum_check(mesh, axis: str):
    """A collective that provably crossed process boundaries: psum of
    each device's global index must equal N(N-1)/2."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    x = jnp.arange(n, dtype=jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P(axis)))

    def f(xs):
        return jax.lax.psum(jnp.sum(xs), axis)

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P(axis),
                            out_specs=P()))(x)
    expected = n * (n - 1) / 2.0
    assert float(out) == expected, (float(out), expected)
    return float(out)


def _pgo_graph():
    """Deterministic loop graph (drifted circle + one loop factor) —
    same on every process, so the sharded solve must agree with the
    single-device solve computed anywhere."""
    import numpy as np

    import jax.numpy as jnp

    from ..core import se3
    from ..graph.posegraph import add_factor, empty_graph

    K = 64
    n = 24
    g = empty_graph(128)
    count = jnp.int32(0)
    w = jnp.asarray([200.0] * 3 + [30.0] * 3, jnp.float32)
    p = np.zeros((K, 6), np.float32)
    for k in range(1, n):
        z = jnp.asarray([0.0, 0.0, 2 * np.pi / n * 1.02, 0.8, 0.0, 0.0],
                        jnp.float32)
        p[k] = np.asarray(se3.compose(jnp.asarray(p[k - 1]), z))
        g, count = add_factor(g, count, jnp.int32(k - 1), jnp.int32(k),
                              z, w)
    z_loop = jnp.zeros((6,), jnp.float32)       # "ICP says: same pose"
    g, count = add_factor(g, count, jnp.int32(n - 1), jnp.int32(0),
                          z_loop, w * 0.2)
    return jnp.asarray(p), jnp.int32(n), g


def run_worker(coordinator: str, num_processes: int, process_id: int,
               out_path: str, n_scans: int = 5,
               local_devices: int = 4) -> None:
    """Worker body: join the service, run a cross-host psum, the
    factor-sharded PGO solve on the global mesh, and a data-parallel
    replay with per-process local streams; process 0 writes results."""
    # pure-CPU fake host: must be set before jax touches a backend
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    initialize(coordinator, num_processes, process_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_processes
    n_global = len(jax.devices())
    assert n_global == num_processes * local_devices

    mesh = global_mesh(axis="data")
    psum_val = _psum_check(mesh, "data")

    # factor-sharded pose-graph solve over the GLOBAL mesh (DCN path)
    from .sharded_pgo import optimize_poses_sharded

    poses, n_nodes, g = _pgo_graph()
    solved = optimize_poses_sharded(poses, n_nodes, g, mesh, axis="data",
                                    gn_iters=6, pcg_iters=64)
    solved = np.asarray(jax.device_get(solved))

    # data-parallel replay: each process feeds its OWN local streams
    from ..core.config import (FeatureConfig, LaserConfig, LegoLoamConfig,
                               MappingConfig, PipelineConfig)
    from ..io.npz_io import pack_sequence
    from ..io.synthetic import make_sequence
    from ..pipeline.slam import init_state, slam_step_impl
    from ..core.types import RawScan

    cfg = LegoLoamConfig(
        laser=LaserConfig(num_horizontal_scans=360),
        feature=FeatureConfig(max_sharp=64, max_less_sharp=512,
                              max_flat=128, max_less_flat=2048,
                              odom_surf_iters=5, odom_corner_iters=5),
        mapping=MappingConfig(max_map_corner=4096, max_map_surf=8192,
                              max_keyframes=64, scan2map_iters=2,
                              surrounding_keyframe_search_num=4,
                              enable_loop_closure=False),
        pipeline=PipelineConfig(max_points=8192, max_segmented=4096),
    )
    local = []
    for b in range(local_devices):
        stream = process_id * local_devices + b     # global stream id
        scans, gt, times = make_sequence(n_scans, cfg, seed=100 + stream,
                                         noise=0.01, radius=6.0)
        local.append(pack_sequence(scans, times, cfg))
    lx = np.stack([np.asarray(p[0]) for p in local])
    lv = np.stack([np.asarray(p[1]) for p in local])
    lt = np.stack([np.asarray(p[2]) for p in local])

    sharding = NamedSharding(mesh, P("data"))
    B = n_global
    gx = jax.make_array_from_process_local_data(sharding, lx,
                                                (B,) + lx.shape[1:])
    gv = jax.make_array_from_process_local_data(sharding, lv,
                                                (B,) + lv.shape[1:])
    gt_ = jax.make_array_from_process_local_data(sharding, lt,
                                                 (B,) + lt.shape[1:])

    def one_sequence(x, v, t):
        def step(state, inp):
            xs, vs, ts = inp
            return slam_step_impl(
                state, RawScan(xyz=xs.reshape(-1, 3), valid=vs, stamp=ts),
                cfg)
        return jax.lax.scan(step, init_state(cfg), (x, v, t))[1]["fused"]

    fn = jax.jit(jax.vmap(one_sequence),
                 in_shardings=(sharding,) * 3,
                 out_shardings=sharding)
    fused = fn(gx, gv, gt_)

    from jax.experimental import multihost_utils

    fused_all = np.asarray(
        multihost_utils.process_allgather(fused, tiled=True))

    if process_id == 0:
        np.savez(out_path, psum=psum_val, solved=solved,
                 fused=fused_all, n_devices=n_global)
    # all processes must reach the barrier before anyone exits, or the
    # coordinator tears down while peers are still in a collective
    multihost_utils.sync_global_devices("multihost_worker_done")


def bench_worker(coordinator: str, num_processes: int, process_id: int,
                 out_path: str, n_scans: int = 40,
                 local_devices: int = 4) -> None:
    """Timed data-parallel replay across hosts — the BASELINE frames/s
    table row for N hosts (benchmarks/scaling.py --hosts)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    initialize(coordinator, num_processes, process_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.config import (FeatureConfig, LaserConfig, LegoLoamConfig,
                               MappingConfig, PipelineConfig)
    from ..core.types import RawScan
    from ..io.npz_io import pack_sequence
    from ..io.synthetic import make_sequence
    from ..pipeline.slam import init_state, slam_step_impl

    cfg = LegoLoamConfig(
        laser=LaserConfig(num_horizontal_scans=360),
        feature=FeatureConfig(max_sharp=64, max_less_sharp=512,
                              max_flat=128, max_less_flat=2048,
                              odom_surf_iters=8, odom_corner_iters=8),
        mapping=MappingConfig(max_map_corner=4096, max_map_surf=8192,
                              max_keyframes=128, scan2map_iters=3,
                              surrounding_keyframe_search_num=8,
                              enable_loop_closure=False),
        pipeline=PipelineConfig(max_points=8192, max_segmented=4096),
    )
    mesh = global_mesh(axis="data")
    B = len(jax.devices())
    local = []
    for b in range(local_devices):
        stream = process_id * local_devices + b
        scans, _, times = make_sequence(n_scans, cfg, seed=100 + stream,
                                        noise=0.01, radius=6.0)
        local.append(pack_sequence(scans, times, cfg))
    lx = np.stack([np.asarray(p[0]) for p in local])
    lv = np.stack([np.asarray(p[1]) for p in local])
    lt = np.stack([np.asarray(p[2]) for p in local])
    sharding = NamedSharding(mesh, P("data"))
    gx = jax.make_array_from_process_local_data(sharding, lx,
                                                (B,) + lx.shape[1:])
    gv = jax.make_array_from_process_local_data(sharding, lv,
                                                (B,) + lv.shape[1:])
    gt_ = jax.make_array_from_process_local_data(sharding, lt,
                                                 (B,) + lt.shape[1:])

    def one_sequence(x, v, t):
        def step(state, inp):
            xs, vs, ts = inp
            return slam_step_impl(
                state, RawScan(xyz=xs.reshape(-1, 3), valid=vs, stamp=ts),
                cfg)
        return jax.lax.scan(step, init_state(cfg), (x, v, t))[1]["fused"]

    fn = jax.jit(jax.vmap(one_sequence),
                 in_shardings=(sharding,) * 3, out_shardings=sharding)
    out = fn(gx, gv, gt_)
    jax.block_until_ready(out)

    reps = 3
    multihost_utils.sync_global_devices("bench_start")
    t0 = time.time()
    for _ in range(reps):
        out = fn(gx, gv, gt_)
    jax.block_until_ready(out)
    multihost_utils.sync_global_devices("bench_end")
    dt = time.time() - t0
    rate = reps * B * n_scans / dt

    if process_id == 0:
        np.savez(out_path, rate=rate, n_devices=B,
                 n_processes=num_processes)
    multihost_utils.sync_global_devices("bench_done")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-scans", type=int, default=5)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--bench", action="store_true",
                    help="timed throughput mode (scaling.py --hosts)")
    args = ap.parse_args(argv)
    worker = bench_worker if args.bench else run_worker
    worker(args.coordinator, args.num_processes, args.process_id,
           args.out, n_scans=args.n_scans,
           local_devices=args.local_devices)
    print(f"[multihost] process {args.process_id} done", file=sys.stderr)


if __name__ == "__main__":
    main()
