"""Stevens-scale stress benchmark (BASELINE.json config 2)

Usage: PYTHONPATH=. python benchmarks/stevens_stress.py  (TPU; one process at a time)
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp
print("backend:", jax.default_backend())

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.io.synthetic import make_sequence
from lego_loam_tpu.io.npz_io import pack_sequence, save_sequence, load_sequence
from lego_loam_tpu.pipeline.slam import replay
from lego_loam_tpu.eval.metrics import ate, rpe

cfg = vlp16()
n = int(os.environ.get("N", "2000"))
seed = int(os.environ.get("SEED", "77"))
cache = f"/tmp/stevens_{n}_{seed}.npz" if seed != 77 else \
    f"/tmp/stevens_{n}.npz"
if os.path.exists(cache):
    scans, gt, times = load_sequence(cache)
else:
    t0 = time.time()
    scans, gt, times = make_sequence(n, cfg, seed=seed, noise=0.01,
                                     trajectory="figure8")
    print(f"generated {n} scans in {time.time()-t0:.0f}s")
    save_sequence(cache, scans, gt, times)

xyz, valid, t = pack_sequence(scans, times, cfg)
xyz, valid, t = jax.device_put((xyz, valid, t))
t0 = time.time()
final, outs = replay(xyz, valid, t, cfg)
jax.block_until_ready(outs)
print(f"compile+run: {time.time()-t0:.0f}s")
xyz_p = xyz.at[0, 0].add(1e-6)
np.asarray(xyz_p[0, :2])
t0 = time.time()
final, outs = replay(xyz_p, valid, t, cfg)
np.asarray(outs["fused"][-1])   # device->host sync (block_until_ready
dt = time.time()-t0             # returns at enqueue on axon)
print(f"steady: {n/dt:.1f} scans/s")

kf = int(final.mapping.store.count)
fc = int(final.mapping.factor_count)
print(f"keyframes {kf}  factors {fc}  loop factors {fc-(kf-1)}")
fused = np.asarray(outs["fused"])
gt_j = jnp.asarray(gt)
gt_rel = np.asarray(jax.vmap(lambda g: se3.relative(gt_j[0], g))(gt_j))
m = ate(fused[:-1], gt_rel[1:len(fused)], align=False)
print("ATE:", {k: round(v,3) for k,v in m.items()})
r = rpe(fused[:-1], gt_rel[1:len(fused)], delta=100)
print("RPE@100:", {k: round(v,3) for k,v in r.items()})
err = np.linalg.norm(fused[:-1,3:]-gt_rel[1:len(fused),3:],axis=1)
for i in range(199, len(err), 200):
    print(f"err@{i}: {err[i]:.3f}")
