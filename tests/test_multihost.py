"""Multi-host runtime test: 2 real processes × 4 virtual CPU devices
join a ``jax.distributed`` coordination service and run cross-process
collectives + the factor-sharded PGO solve + data-parallel replay
(SURVEY.md §4: "local multi-process, faking a mesh").

The workers run WITHOUT the axon sitecustomize on purpose (PYTHONPATH is
rebuilt without ``/root/.axon_site``): worker processes must never claim
the exclusive TPU session, and these are pure-CPU fake hosts.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(n_local: int) -> dict:
    env = dict(os.environ)
    # drop the axon sitecustomize: CPU-only fake hosts, no TPU claim
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + parts)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    return env


@pytest.mark.slow
def test_two_process_mesh():
    n_proc, n_local = 2, 4
    port = _free_port()
    out = "/tmp/multihost_test_out.npz"
    if os.path.exists(out):
        os.remove(out)

    procs = []
    for pid in range(n_proc):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "lego_loam_tpu.distributed.multihost",
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(n_proc), "--process-id", str(pid),
             "--out", out, "--local-devices", str(n_local)],
            env=_worker_env(n_local), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))

    outs = [p.communicate(timeout=540) for p in procs]
    for pid, (p, (so, se)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\n--- stdout\n"
            f"{so.decode()[-2000:]}\n--- stderr\n{se.decode()[-4000:]}")

    assert os.path.exists(out), "process 0 wrote no results"
    z = np.load(out)
    n_global = int(z["n_devices"])
    assert n_global == n_proc * n_local

    # cross-process psum: sum of global device indices
    assert float(z["psum"]) == n_global * (n_global - 1) / 2.0

    # factor-sharded PGO over the 2-process mesh == single-device solve
    from lego_loam_tpu.distributed.multihost import _pgo_graph
    from lego_loam_tpu.graph.posegraph import optimize_poses

    poses, n_nodes, g = _pgo_graph()
    ref = np.asarray(optimize_poses(poses, n_nodes, g,
                                    gn_iters=6, pcg_iters=64))
    np.testing.assert_allclose(z["solved"], ref, rtol=1e-4, atol=1e-4)

    # data-parallel replay across hosts: spot-check one stream per host
    # against its single-process replay
    from lego_loam_tpu.distributed.multihost import run_worker  # noqa: F401
    from lego_loam_tpu.io.npz_io import pack_sequence
    from lego_loam_tpu.io.synthetic import make_sequence
    from lego_loam_tpu.pipeline.slam import replay
    from tests.test_distributed import _tiny_cfg

    cfg = _tiny_cfg()
    fused = z["fused"]                      # (8, n_scans, 6)
    assert fused.shape[0] == n_global
    for stream in (0, n_global - 1):        # one from each process
        scans, _, times = make_sequence(fused.shape[1], cfg,
                                        seed=100 + stream, noise=0.01,
                                        radius=6.0)
        x, v, t = pack_sequence(scans, times, cfg)
        ref_out = np.asarray(replay(x, v, t, cfg)[1]["fused"])
        np.testing.assert_allclose(fused[stream], ref_out, atol=1e-5)
