"""Stevens-scale stress benchmark (BASELINE.json config 2)

Usage: PYTHONPATH=. python benchmarks/stevens_stress.py  (TPU; one process at a time)
Set OUT=STEVENS_rNN.json to write the judged artifact.
"""
import functools
import json
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
print("backend:", jax.default_backend())

from lego_loam_tpu.core import se3
from lego_loam_tpu.core.config import vlp16
from lego_loam_tpu.io.synthetic import make_sequence
from lego_loam_tpu.io.npz_io import pack_sequence, save_sequence, load_sequence
from lego_loam_tpu.pipeline.slam import replay
from lego_loam_tpu.eval.metrics import ate, rpe

import dataclasses
cfg = vlp16()
n = int(os.environ.get("N", "2000"))
seed = int(os.environ.get("SEED", "77"))
# Stevens scale (>20K scans, ~7.6K keyframes at 0.3 m spacing on the
# figure-eight) needs more than the default 4096-keyframe capacity;
# saturation is now counted, not silent (pipeline/mapping.py).
kf_cap = int(os.environ.get("KF_CAP", "8192" if n > 4000 else "4096"))
loop_on = os.environ.get("LOOP", "1") == "1"
# Loop-OFF at Stevens scale: the 50 m-radius submap assembly
# (mapOptmization.cpp:917-986) unions essentially EVERY keyframe of this
# compact world — the default voxel caps (sized for the latest-50 window)
# censor ~50 K voxels at an x-plane after 6 laps (measured map_sat).
# The reference's PCL voxel grids are unbounded; emulate with bigger
# fixed caps in this regime (env-overridable).
map_corner = int(os.environ.get(
    "MAP_CORNER", cfg.mapping.max_map_corner if loop_on else 16384))
map_surf = int(os.environ.get(
    "MAP_SURF", cfg.mapping.max_map_surf if loop_on else 65536))
cfg = cfg.replace(mapping=dataclasses.replace(
    cfg.mapping, max_keyframes=kf_cap,
    scan2map_reassoc_every=int(os.environ.get(
        "REASSOC", cfg.mapping.scan2map_reassoc_every)),
    enable_loop_closure=loop_on,
    max_map_corner=map_corner, max_map_surf=map_surf,
    max_loop_factors=max(1024, cfg.mapping.max_loop_factors)))
cache = f"/tmp/stevens_{n}_{seed}.npz" if seed != 77 else \
    f"/tmp/stevens_{n}.npz"
# The figure-eight is periodic (70 s = 700 scans): generate/cache ONE
# period and tile it — the vehicle genuinely revisits the same poses in
# the same world, so lap k's scans ARE lap 1's; only the timestamps
# advance.  (20K scans of raycasting would take hours on this 2-core
# host; the engine still processes every scan individually.)
period = 700
base_n = min(n, period)
cache = cache.replace(f"_{n}", f"_base{base_n}")
if os.path.exists(cache):
    scans, gt, times = load_sequence(cache)
    scans = list(scans)
else:
    t0 = time.time()
    scans, gt, times = make_sequence(base_n, cfg, seed=seed, noise=0.01,
                                     trajectory="figure8")
    print(f"generated {base_n} scans in {time.time()-t0:.0f}s")
    save_sequence(cache, scans, gt, times)
reps = (n + base_n - 1) // base_n
if n > base_n:
    gt = np.tile(gt, (reps, 1))[:n]
    times = (np.arange(n) * cfg.laser.scan_period).astype(np.float32)
    print(f"tiled to {n} scans ({reps} laps of the period)")

# The tiled 20 K-scan input is ~7.9 GB of points — it does NOT fit
# on-device next to the SLAM state (measured RESOURCE_EXHAUSTED), and
# the engine never needs it to: feed fixed-shape CHUNKS through
# pipeline.slam.replay_from (state carried across calls; bit-exact vs
# one whole-sequence replay — tests/test_io.py, multi_session.py).
# Chunks are gathered ON DEVICE from the one-period base (~275 MB), so
# the host→device traffic is one base transfer total.
from lego_loam_tpu.pipeline.slam import init_state, replay_from

chunk = min(n, int(os.environ.get("CHUNK", "2000")))
if n % chunk:
    # snap to the largest divisor of n <= the requested chunk so any N
    # works (replay_from compiles once per distinct chunk shape)
    chunk = max(d for d in range(1, chunk + 1) if n % d == 0)
    print(f"chunk snapped to {chunk} (divides N={n})")
xyz_b, valid_b, _ = pack_sequence(scans, times[:base_n], cfg)
times_n = jnp.asarray(times[:n])
xyz_b, valid_b = jax.device_put((xyz_b, valid_b))


@functools.partial(jax.jit, static_argnames=())
def chunk_inputs(xb, vb, c0):
    rows = (c0 + jnp.arange(chunk)) % base_n
    return xb[rows], vb[rows], jax.lax.dynamic_slice(
        times_n, (c0,), (chunk,))


def run_pass(eps, verbose=False):
    xb = xyz_b.at[0, 0].add(eps) if eps else xyz_b   # base copy: 275 MB
    state = init_state(cfg)
    acc = {"fused": [], "factor_count": [], "kf_count": [],
           "odom": [], "mapped": [], "loop_diag": []}
    chunk_times = []
    t0 = time.time()
    for c0 in range(0, n, chunk):
        tc = time.time()
        x, v, tt = chunk_inputs(xb, vb=valid_b, c0=jnp.int32(c0))
        if os.environ.get("BENCH_PROFILE") and c0 == chunk:
            # profile the SECOND chunk (steady state, closures firing)
            with jax.profiler.trace(os.environ["BENCH_PROFILE"],
                                    create_perfetto_trace=True):
                state, outs = replay_from(state, x, v, tt, cfg)
                np.asarray(outs["fused"][-1])
        else:
            state, outs = replay_from(state, x, v, tt, cfg)
        # sync EVERY chunk: the axon tunnel returns at enqueue, so an
        # unsynced loop queues all n/chunk chunks at once and their
        # ~0.8 GB inputs coexist on device — measured worker crash
        # (OOM) at 10 chunks; with the sync at most two are alive
        for k in acc:
            acc[k].append(np.asarray(outs[k]))
        chunk_times.append(time.time() - tc)
        if verbose:
            print(f"  chunk {c0 // chunk + 1}/{n // chunk}: "
                  f"{chunk_times[-1]:.1f}s", flush=True)
    return chunk_times, state, {k: np.concatenate(v)
                                for k, v in acc.items()}


# ONE measured pass: chunk 1 carries the compile, the steady rate is
# taken over chunks 2..N (all identical shapes/work — each chunk is
# n/chunk full laps' worth of scans, so the mix of mapping cycles and
# loop-closure attempts is the same in every chunk).  A second
# whole-sequence timing pass doubles the 20 K-scan wall-clock and the
# exposure to axon-tunnel worker crashes (r3: OOM at 10 queued chunks;
# r4: worker crash mid-second-pass) for no extra information.
t0 = time.time()
chunk_times, final, outs = run_pass(0.0, verbose=True)
print(f"compile+run: {time.time()-t0:.0f}s ({n} scans, chunk={chunk})")
if len(chunk_times) > 1:
    # MEDIAN chunk rate: the axon tunnel occasionally stalls one chunk
    # for minutes (measured 290 s amid 24.7 s siblings) — a mean would
    # report the tunnel hiccup, not the engine
    dt = float(np.median(chunk_times[1:]))
    n_eff = chunk
else:
    dt = chunk_times[0]
    n_eff = n
print(f"steady: {n_eff/dt:.1f} scans/s (median of chunks "
      f"2..{len(chunk_times)}; chunk 1 = compile; all: "
      f"{[round(c, 1) for c in chunk_times]})")

kf = int(final.mapping.store.count)
fc = int(final.mapping.factor_count)
kf_drop = int(final.mapping.meta.kf_dropped)
f_drop = int(final.mapping.meta.factor_dropped)
m_sat = int(final.mapping.meta.map_sat)
print(f"keyframes {kf}  factors {fc}  loop factors {fc-(kf-1)}")
print(f"saturation: kf_dropped={kf_drop} factor_dropped={f_drop} "
      f"map_voxel_sat={m_sat}")
fused = np.asarray(outs["fused"])
gt_j = jnp.asarray(gt)
gt_rel = np.asarray(jax.vmap(lambda g: se3.relative(gt_j[0], g))(gt_j))
m = ate(fused[:-1], gt_rel[1:len(fused)], align=False)
print("ATE:", {k: round(v,3) for k,v in m.items()})
r = rpe(fused[:-1], gt_rel[1:len(fused)], delta=100)
print("RPE@100:", {k: round(v,3) for k,v in r.items()})
err = np.linalg.norm(fused[:-1,3:]-gt_rel[1:len(fused),3:],axis=1)
fcs = np.asarray(outs.get("factor_count", np.zeros(len(fused))))
kcs = np.asarray(outs.get("kf_count", np.zeros(len(fused))))
step = int(os.environ.get("ERR_EVERY", "200"))
for i in range(step - 1, len(err), step):
    print(f"err@{i}: {err[i]:.3f}  kf={int(kcs[i])} "
          f"loopf={int(fcs[i]) - (int(kcs[i]) - 1)}")
if os.environ.get("DUMP"):
    np.savez(os.environ["DUMP"], fused=fused, gt_rel=gt_rel,
             factor_count=fcs, kf_count=kcs, odom=outs["odom"],
             mapped=outs["mapped"], loop_diag=outs["loop_diag"])
    print("dumped", os.environ["DUMP"])

# saturation gates LAST so the diagnostics above survive a failure
assert kf_drop == 0, f"keyframe capacity saturated ({kf_drop} dropped)"
assert f_drop == 0, f"factor capacity saturated ({f_drop} dropped)"
assert m_sat == 0, f"world-frame voxel filter saturated ({m_sat} voxels)"

out_path = os.environ.get("OUT")
if out_path:
    with open(out_path, "w") as f:
        json.dump({
            "benchmark": "stevens_stress",
            "backend": jax.default_backend(),
            "n_scans": n, "seed": seed, "kf_cap": kf_cap,
            "loop_closure": bool(cfg.mapping.enable_loop_closure),
            "scans_per_sec": round(n_eff / dt, 1),
            "timing": "median-chunk steady rate of one pass (chunk 1 "
                      "absorbs the compile; median tolerates one-off "
                      "axon tunnel stalls)",
            "chunk_seconds": [round(c, 1) for c in chunk_times],
            "keyframes": kf, "factors": fc,
            "loop_factors": fc - (kf - 1),
            "kf_dropped": kf_drop, "factor_dropped": f_drop,
            "map_voxel_sat": m_sat,
            "ate": {k: round(v, 4) for k, v in m.items()},
            "rpe_100": {k: round(v, 4) for k, v in r.items()},
        }, f, indent=1)
    print(f"wrote {out_path}")
