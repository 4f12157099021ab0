#!/usr/bin/env python
"""Per-stage timing breakdown on the real chip.

Times each pipeline stage (projection+segmentation, odometry, mapping)
as its own jitted function, so optimization effort goes where the
milliseconds are.  The full-pipeline number differs slightly (fusion in
one program lets XLA overlap), but the ratios hold.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, n=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    # sync via host transfer (axon block_until_ready can return at enqueue)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / n
    print(f"{name:32s} {dt * 1000:8.3f} ms")
    return dt


def main():
    from lego_loam_tpu.core.config import vlp16
    from lego_loam_tpu.core.types import RawScan
    from lego_loam_tpu.frontend.segmentation import image_projection
    from lego_loam_tpu.io.npz_io import pack_sequence
    from lego_loam_tpu.io.synthetic import make_sequence
    from lego_loam_tpu.pipeline import mapping as mapping_mod
    from lego_loam_tpu.pipeline import odometry as odometry_mod
    from lego_loam_tpu.graph import keyframes

    cfg = vlp16()
    print(f"backend: {jax.default_backend()}")

    scans, gt, times = make_sequence(12, cfg, seed=42, noise=0.01, speed=1.2)
    xyz, valid, t = pack_sequence(scans, times, cfg)
    xyz, valid, t = jax.device_put((xyz, valid, t))

    raw = RawScan(xyz=xyz[5].reshape(-1, 3), valid=valid[5], stamp=t[5])

    proj_fn = jax.jit(lambda r: image_projection(r, cfg))
    proj = proj_fn(raw)
    jax.block_until_ready(proj)

    odo_state = odometry_mod.init_state(cfg)
    odo_fn = jax.jit(lambda s, p: odometry_mod.odometry_step(s, p, cfg))
    # warm the odometry state so KD/last buffers are populated
    for i in range(3):
        r = RawScan(xyz=xyz[i].reshape(-1, 3), valid=valid[i], stamp=t[i])
        odo_state, assoc = odo_fn(odo_state, proj_fn(r))
    jax.block_until_ready(odo_state)

    map_state = mapping_mod.init_state(cfg)
    map_fn = jax.jit(lambda mm, cl, a: mapping_mod.mapping_step(mm, cl, a, cfg))
    meta, row, mapped = map_fn(map_state.meta, map_state.clouds, assoc)
    clouds = keyframes.apply_row(map_state.clouds, row)
    jax.block_until_ready(meta)

    t_proj = timeit(proj_fn, (raw,), name="stage1 projection+segmentation")
    t_odo = timeit(odo_fn, (odo_state, proj), name="stage2 odometry")
    t_map = timeit(map_fn, (meta, clouds, assoc), name="stage3 mapping")

    divider = cfg.mapping.mapping_frequency_divider
    amortized = t_proj + t_odo + t_map / divider
    print(f"{'amortized/scan (map/5)':32s} {amortized * 1000:8.3f} ms "
          f"-> {1 / amortized:.1f} scans/s upper bound")

    out_path = os.environ.get("STAGE_TIMING_OUT")
    if out_path:
        import json
        with open(out_path, "w") as f:
            json.dump({
                "backend": jax.default_backend(),
                "stage1_projection_segmentation_ms": round(t_proj * 1e3, 3),
                "stage2_odometry_ms": round(t_odo * 1e3, 3),
                "stage3_mapping_ms": round(t_map * 1e3, 3),
                "mapping_divider": divider,
                "amortized_per_scan_ms": round(amortized * 1e3, 3),
                "upper_bound_scans_per_sec": round(1 / amortized, 1),
            }, f, indent=2)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
