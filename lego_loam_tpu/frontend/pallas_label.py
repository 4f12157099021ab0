"""Pallas TPU kernel: connected-component label propagation in VMEM.

The jnp implementation of the segmentation flood (segmentation.py) lowers
to hundreds of tiny HLO kernels per sweep (associative scans × 4
directions × while_loop) — ~6.5 ms/scan of pure dispatch on a (16, 1800)
image that fits in a few hundred KB.  This kernel keeps labels + edge
masks resident in VMEM and runs the whole fixed-point loop on the VPU:

* per sweep, a Hillis-Steele *segmented* min-scan (log-doubling with an
  AND-doubled connectivity mask) along rows forward/backward and columns
  down/up — full straight-run propagation per sweep;
* horizontal wraparound handled by a masked min between columns 0 and
  H−1 (``labelComponents``' circular neighbours,
  ``imageProjection.cpp:446-451``);
* `lax.while_loop` until no label changes (≤ ``max_sweeps``).

Produces bit-identical components to the reference BFS (same criterion
edges, min-label canonical form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SENT = 2 ** 30  # python literal: pallas kernels must not capture array constants


def _shift(x: Array, s: int, axis: int, fill) -> Array:
    """Value at index j becomes x[j-s] (s>0) with ``fill`` for j<s."""
    rolled = pltpu.roll(x, s % x.shape[axis], axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if s >= 0:
        keep = idx >= s
    else:
        keep = idx < x.shape[axis] + s
    return jnp.where(keep, rolled, fill)


def _segmented_sweep(lab: Array, conn: Array, axis: int, reverse: bool,
                     n_steps: int) -> Array:
    """Segmented min-scan along ``axis`` via log-doubling.

    ``conn[j]`` = 1 iff element j is edge-connected to its predecessor
    (successor when ``reverse``) along the axis.
    """
    sgn = -1 if reverse else 1
    g = conn
    v = lab
    for k in range(n_steps):
        s = sgn * (1 << k)
        v_sh = _shift(v, s, axis, _SENT)
        v = jnp.minimum(v, jnp.where(g > 0, v_sh, _SENT))
        g_sh = _shift(g, s, axis, 0)
        g = g * g_sh
    return v


def _kernel(lab_ref, right_ref, down_ref, wrap_ref, out_ref, *, v, h,
            h_true, max_sweeps):
    import math

    row_steps = max(1, math.ceil(math.log2(h_true)))
    col_steps = max(1, math.ceil(math.log2(v)))

    right = right_ref[:]                     # j ↔ j+1 edge (0 at pads)
    down = down_ref[:]                       # i ↔ i+1 edge
    conn_fwd = _shift(right, 1, 1, 0)        # j connected to j-1
    conn_bwd = right                         # j connected to j+1
    conn_dn = _shift(down, 1, 0, 0)          # i connected to i-1
    conn_up = down                           # i connected to i+1
    wrap = wrap_ref[:, 0:1]                  # (V,1) col h_true-1 ↔ 0 edge
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (v, h), 1)

    def sweep(lab):
        lab = _segmented_sweep(lab, conn_fwd, 1, False, row_steps)
        lab = _segmented_sweep(lab, conn_bwd, 1, True, row_steps)
        lab = _segmented_sweep(lab, conn_dn, 0, False, col_steps)
        lab = _segmented_sweep(lab, conn_up, 0, True, col_steps)
        # wraparound: min(col 0, col h_true-1) where the wrap edge exists
        first = lab[:, 0:1]
        last = lab[:, h_true - 1:h_true]
        mn = jnp.minimum(first, last)
        lab = jnp.where((col_idx == 0) & (wrap > 0), mn, lab)
        lab = jnp.where((col_idx == h_true - 1) & (wrap > 0), mn, lab)
        return lab

    def cond(state):
        _, changed, it = state
        return changed & (it < max_sweeps)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    lab0 = sweep(lab_ref[:])
    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab0, jnp.bool_(True), jnp.int32(0)))
    out_ref[:] = lab


@functools.partial(jax.jit, static_argnames="max_sweeps")
def propagate_labels_pallas(labels0: Array, right: Array, down: Array,
                            max_sweeps: int = 16) -> Array:
    """Run the in-VMEM fixed-point flood.

    Args:
      labels0: (V, H) int32 — flat index per segmentable pixel, sentinel
        elsewhere.
      right: (V, H) int32 0/1 — edge (i,j)↔(i,j+1 mod H).
      down: (V, H) int32 0/1 — edge (i,j)↔(i+1,j).

    Returns converged (V, H) int32 labels.
    """
    v, h_true = labels0.shape
    # pad lanes to a 128 multiple (Mosaic compiles large rolls on
    # unaligned lane counts pathologically slowly) and quarantine the pad:
    # labels = sentinel, no edges into it; the H-1 ↔ 0 wrap edge moves to
    # a dedicated input column.
    h = ((h_true + 127) // 128) * 128
    pad = h - h_true
    wrap = right[:, h_true - 1:h_true] * 1
    right = right.at[:, h_true - 1].set(0)
    if pad:
        labels0 = jnp.pad(labels0, ((0, 0), (0, pad)),
                          constant_values=_SENT)
        right = jnp.pad(right, ((0, 0), (0, pad)))
        down = jnp.pad(down, ((0, 0), (0, pad)))
    wrap = jnp.broadcast_to(wrap, (v, 128)) * jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (v, 128), 1) == 0, 1, 1)

    kernel = functools.partial(_kernel, v=v, h=h, h_true=h_true,
                               max_sweeps=max_sweeps)
    # Mosaic keeps the unrolled doubling temporaries live on the scoped
    # vmem stack (~28 arrays); large images (HDL-64: 64×2176) need the
    # limit raised above the 16 MB default.
    vmem_bytes = v * h * 4 * 32
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((v, h), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(vmem_bytes, 32 * 1024 * 1024)),
    )(labels0, right, down, wrap)
    return out[:, :h_true]
