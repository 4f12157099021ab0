"""Mesh construction + data-parallel replay sharding.

The reference has no distributed story (SURVEY.md §2.1) — its scale axis
is threads in one process.  Ours: a named device mesh; independent replay
streams (multi-session, BASELINE.json config 5) shard over ``data``; the
pose-graph factor axis shards over ``pgo`` (see sharded_pgo.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LegoLoamConfig
from ..core.types import RawScan
from ..pipeline.slam import init_state, slam_step_impl


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axis_names=(axis,))


def replay_sharded(xyz: jax.Array, valid: jax.Array, times: jax.Array,
                   cfg: LegoLoamConfig, mesh: Mesh, axis: str = "data"):
    """Replay B independent sequences, sharded over ``mesh[axis]``.

    Args: (B, N, P*3) / (B, N, P) / (B, N) stacked sequences
    (coordinates row-flattened, see ``io.npz_io.pack_sequence``); B must
    be divisible by the mesh axis size.

    Returns (final_states, outputs) with leading batch axis sharded.
    """
    B = xyz.shape[0]
    assert B % mesh.shape[axis] == 0, (B, mesh.shape)
    sharding = NamedSharding(mesh, P(axis))

    xyz = jax.device_put(xyz, sharding)
    valid = jax.device_put(valid, sharding)
    times = jax.device_put(times, sharding)

    def one_sequence(x, v, t):
        def step(state, inp):
            xs, vs, ts = inp
            return slam_step_impl(
                state,
                RawScan(xyz=xs.reshape(-1, 3), valid=vs, stamp=ts), cfg)
        return jax.lax.scan(step, init_state(cfg), (x, v, t))

    fn = jax.jit(jax.vmap(one_sequence),
                 in_shardings=(sharding, sharding, sharding))
    return fn(xyz, valid, times)
