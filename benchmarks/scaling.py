"""Data-parallel scaling harness (BASELINE scaling-efficiency metric).

Measures multi-session replay throughput at 1/2/4/8 devices over a
`shard_map`-style mesh.  On this container only virtual CPU devices are
available (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count);
on a real multi-chip slice the identical code path rides ICI.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/scaling.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip())

import numpy as np
import jax.numpy as jnp


def main():
    import dataclasses

    from lego_loam_tpu.core.config import (FeatureConfig, LaserConfig,
                                           LegoLoamConfig, MappingConfig,
                                           PipelineConfig)
    from lego_loam_tpu.distributed.mesh import make_mesh, replay_sharded
    from lego_loam_tpu.io.npz_io import pack_sequence
    from lego_loam_tpu.io.synthetic import make_sequence

    # small shapes: this measures parallel efficiency, not kernel speed
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
    n_scans = 20
    scans, gt, times = make_sequence(n_scans, cfg, seed=5, noise=0.01)
    xyz, valid, t = pack_sequence(scans, times, cfg)

    results = {}
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(jax.devices()):
            break
        B = n_dev                        # one stream per device
        bx = jnp.broadcast_to(xyz[None], (B,) + xyz.shape)
        bv = jnp.broadcast_to(valid[None], (B,) + valid.shape)
        bt = jnp.broadcast_to(t[None], (B,) + t.shape)
        mesh = make_mesh(n_dev)
        _, outs = replay_sharded(bx, bv, bt, cfg, mesh)   # compile
        jax.block_until_ready(outs)
        t0 = time.time()
        for _ in range(3):
            _, outs = replay_sharded(bx, bv, bt, cfg, mesh)
        jax.block_until_ready(outs)
        rate = 3 * B * n_scans / (time.time() - t0)
        results[n_dev] = rate
        eff = rate / (results[1] * n_dev) if n_dev > 1 else 1.0
        print(f"devices={n_dev}  {rate:7.1f} scans/s  "
              f"efficiency={eff*100:5.1f}%")

    if 2 in results:
        eff2 = results[2] / (2 * results[1])
        print(f"\n2-device scaling efficiency: {eff2*100:.1f}% "
              f"(target >= 80%)")


if __name__ == "__main__":
    main()
