"""SE(3) / SO(3) utilities — one clean convention for the whole engine.

The reference maintains poses as ``float[6] = [rx,ry,rz,tx,ty,tz]`` in a
permuted "camera" frame with a Y-X-Z Euler chain and ~120-line closed-form
composition routines (``featureAssociation.cpp:474-500``,
``mapOptmization.cpp:264-387``, ``transformFusion.cpp:64-185``).  Per
SURVEY.md §2.6 we instead use ONE convention everywhere:

* frame: lidar — x forward, y left, z up;
* pose vector ``p = [roll, pitch, yaw, tx, ty, tz]`` (radians, metres);
* rotation ``R(p) = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` (extrinsic x-y-z);
* a pose maps body/scan coordinates into the parent frame:
  ``x_parent = R x_body + t``.

Everything is pure jnp, differentiable (LM Jacobians come from ``jacfwd``),
and shape-polymorphic over leading batch dims via ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rot_x(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, c, -s], -1),
        jnp.stack([zero, s, c], -1),
    ], -2)


def rot_y(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, zero, s], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-s, zero, c], -1),
    ], -2)


def rot_z(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, -s, zero], -1),
        jnp.stack([s, c, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)


def rpy_to_matrix(rpy: Array) -> Array:
    """(…,3) [roll,pitch,yaw] → (…,3,3) with R = Rz Ry Rx."""
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    return rot_z(yaw) @ rot_y(pitch) @ rot_x(roll)


def matrix_to_rpy(R: Array) -> Array:
    """(…,3,3) → (…,3) [roll,pitch,yaw]; inverse of :func:`rpy_to_matrix`.

    Gimbal-safe for |pitch| < π/2 (ground vehicles never approach it)."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], -1)


def pose_matrix(p: Array) -> Array:
    """(…,6) pose vector → (…,4,4) homogeneous transform."""
    R = rpy_to_matrix(p[..., :3])
    t = p[..., 3:]
    top = jnp.concatenate([R, t[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def matrix_to_pose(T: Array) -> Array:
    """(…,4,4) → (…,6)."""
    return jnp.concatenate([matrix_to_rpy(T[..., :3, :3]), T[..., :3, 3]], -1)


def apply(p: Array, pts: Array) -> Array:
    """Transform points (…,3) by pose (…,6): ``R x + t``.

    Batch dims of pose and points broadcast (per-point poses supported —
    the de-skew path uses one interpolated pose per point)."""
    R = rpy_to_matrix(p[..., :3])
    return jnp.einsum("...ij,...j->...i", R, pts) + p[..., 3:]


def apply_inverse(p: Array, pts: Array) -> Array:
    """``Rᵀ (x − t)``."""
    R = rpy_to_matrix(p[..., :3])
    return jnp.einsum("...ji,...j->...i", R, pts - p[..., 3:])


def compose(a: Array, b: Array) -> Array:
    """Pose of ``b`` expressed through ``a``: ``T(a) @ T(b)`` as a 6-vector."""
    Ra = rpy_to_matrix(a[..., :3])
    Rb = rpy_to_matrix(b[..., :3])
    R = Ra @ Rb
    t = (Ra @ b[..., 3:, None])[..., 0] + a[..., 3:]
    return jnp.concatenate([matrix_to_rpy(R), t], -1)


def inverse(p: Array) -> Array:
    R = rpy_to_matrix(p[..., :3])
    Rt = jnp.swapaxes(R, -1, -2)
    t = -(Rt @ p[..., 3:, None])[..., 0]
    return jnp.concatenate([matrix_to_rpy(Rt), t], -1)


def relative(a: Array, b: Array) -> Array:
    """``a⁻¹ ∘ b`` — the motion taking frame a to frame b."""
    return compose(inverse(a), b)


def scale_pose(p: Array, s: Array) -> Array:
    """Constant-velocity interpolation used for de-skew: linearly scale the
    Euler angles and translation (matches ``TransformToStart``,
    ``featureAssociation.cpp:388-418``, which does exactly this)."""
    return p * s


def normalize_angles(p: Array) -> Array:
    """Wrap the rpy part of a pose into (−π, π]."""
    ang = (p[..., :3] + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    return jnp.concatenate([ang, p[..., 3:]], -1)


def identity_pose(dtype=jnp.float32) -> Array:
    return jnp.zeros((6,), dtype=dtype)


# --- so(3)/se(3) exponential map (used by the pose-graph optimizer) --------

def skew(w: Array) -> Array:
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zero, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zero, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zero], -1),
    ], -2)


def so3_exp(w: Array) -> Array:
    """Rodrigues formula, Taylor-safe near zero."""
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = skew(w)
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: Array) -> Array:
    """Inverse of :func:`so3_exp` for θ < π.

    Written in atan2 form with an ε-regularised norm so that ``jacfwd``
    through it stays finite at R = I — the arccos form has an infinite
    derivative exactly where zero-residual pose-graph factors sit.
    """
    w_hat = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)                                       # = 2 sinθ · axis
    s2 = jnp.sqrt(jnp.sum(w_hat * w_hat, -1) + 1e-24)   # 2 sinθ
    c2 = jnp.trace(R, axis1=-2, axis2=-1) - 1.0         # 2 cosθ
    theta = jnp.arctan2(s2, c2)
    small = s2 < 1e-6
    scale = jnp.where(small, 0.5 + theta * theta / 12.0,
                      theta / jnp.where(small, 1.0, s2))
    return scale[..., None] * w_hat
