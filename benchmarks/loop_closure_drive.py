"""Loop-closure end-to-end drive (run on TPU)

The one judged benchmark where a loop closure actually FIRES on device:
the 200-scan bench arc never revisits, so the detect+ICP+pose-graph+
grid-rebuild cost (``mapOptmization.cpp:767-854, 1481-1511``) is
invisible to ``bench.py``.  This drives a full 360-scan lap (lap time
31.4 s > the 30 s loop gate), reports steady-state scans/s with the
closure inside the measurement, and the trajectory error before vs
after the revisit.

Usage: PYTHONPATH=. python benchmarks/loop_closure_drive.py
       (TPU; one process at a time)
Set OUT=LOOPFIRE_rNN.json to write the judged artifact.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
print("backend:", jax.default_backend())

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.io.synthetic import make_sequence
from lego_loam_tpu.io.npz_io import (pack_sequence, save_sequence,
                                     load_sequence)
from lego_loam_tpu.pipeline.slam import replay
from lego_loam_tpu.eval.metrics import ate

cfg = vlp16()
# one full lap = 2*pi*6.5/1.3 = 31.4 s > 30 s loop time gap
n = int(os.environ.get("N", "360"))
cache = f"/tmp/loopfire_{n}.npz"
if os.path.exists(cache):
    scans, gt, times = load_sequence(cache)
else:
    t0 = time.time()
    scans, gt, times = make_sequence(n, cfg, seed=21, noise=0.01,
                                     radius=6.5, speed=1.3)
    print(f"generated {n} scans in {time.time()-t0:.0f}s")
    save_sequence(cache, scans, gt, times)
xyz, valid, t = pack_sequence(scans, times, cfg)
t0 = time.time()
final, outs = replay(xyz, valid, t, cfg)
jax.block_until_ready(outs)
print(f"compile+run: {time.time()-t0:.1f}s")
profile_dir = os.environ.get("BENCH_PROFILE")
if profile_dir:
    with jax.profiler.trace(profile_dir, create_perfetto_trace=True):
        final, outs = replay(xyz, valid, t, cfg)
        np.asarray(outs["fused"][-1])
    print(f"profiler trace written to {profile_dir}")
# one warm-up BETWEEN compile and timing: the second execution of a
# fresh executable consistently runs several× slower than steady state
# on the axon backend (measured 25 vs 189 scans/s on identical runs —
# same warm-up cliff bench.py works around with its run alternation)
final, outs = replay(xyz, valid, t, cfg)
np.asarray(outs["fused"][-1])
t0 = time.time()
final, outs = replay(xyz, valid, t, cfg)
jax.block_until_ready(outs)
np.asarray(outs["fused"][-1])
dt = time.time() - t0
print(f"steady: {n/dt:.1f} scans/s")

kf = int(final.mapping.store.count)
fc = int(final.mapping.factor_count)
loop_factors = fc - (kf - 1)
print(f"keyframes: {kf}  factors: {fc}  loop factors: {loop_factors}")
fused = np.asarray(outs["fused"])
gt_j = jnp.asarray(gt)
gt_rel = np.asarray(jax.vmap(lambda g: se3.relative(gt_j[0], g))(gt_j))
m = ate(fused[:-1], gt_rel[1:len(fused)], align=False)
print("full-run ATE:", {k: round(v, 3) for k, v in m.items()})
# error at the end (post-revisit) vs mid-run
err = np.linalg.norm(fused[:-1, 3:] - gt_rel[1:len(fused), 3:], axis=1)
print(f"err@150: {err[150]:.3f}  err@300: {err[300]:.3f}  "
      f"err@end: {err[-1]:.3f}")

out_path = os.environ.get("OUT")
if out_path:
    with open(out_path, "w") as f:
        json.dump({
            "benchmark": "loop_closure_drive",
            "backend": jax.default_backend(),
            "n_scans": n,
            "scans_per_sec": round(n / dt, 1),
            "keyframes": kf, "factors": fc,
            "loop_factors": loop_factors,
            "ate": {k: round(v, 4) for k, v in m.items()},
            "err_pre_revisit_m": round(float(err[150]), 4),
            "err_post_revisit_m": round(float(err[-1]), 4),
            "note": "steady scans/s includes the in-graph loop "
                    "detect+ICP+PGO+grid-rebuild cost; err_pre/post "
                    "show the closure pulling the lap back onto the "
                    "ground truth",
        }, f, indent=1)
    print(f"wrote {out_path}")
