"""Minimal 3D math helpers (rotations, quaternions, Euler charts).

Conventions copy the reference exactly so state charts line up
(`mpc_controller/utils/transform.py`):
- Euler angles stored as [yaw, pitch, roll] ("ypr"), rotation
  R = Rz(yaw) @ Ry(pitch) @ Rx(roll)  (ZYX intrinsic, = pinocchio
  rpyToMatrix(roll, pitch, yaw)).
- Quaternions as wxyz (MuJoCo order).
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """3-vector -> skew-symmetric matrix, batched over leading dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rotation_about_axis(axis, angle):
    """Rodrigues rotation about a (constant unit) axis. Batched over angle."""
    axis = jnp.asarray(axis, dtype=jnp.result_type(angle))
    K = skew(axis)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.eye(3, dtype=axis.dtype)
    return eye + s * K + (1.0 - c) * (K @ K)


def rot_x(a):
    return rotation_about_axis(jnp.array([1.0, 0.0, 0.0]), a)


def rot_y(a):
    return rotation_about_axis(jnp.array([0.0, 1.0, 0.0]), a)


def rot_z(a):
    return rotation_about_axis(jnp.array([0.0, 0.0, 1.0]), a)


def ypr_to_matrix(ypr):
    """[yaw, pitch, roll] -> R = Rz(y) Ry(p) Rx(r)."""
    return rot_z(ypr[..., 0]) @ rot_y(ypr[..., 1]) @ rot_x(ypr[..., 2])


def matrix_to_ypr(R):
    """Inverse of ypr_to_matrix. Returns [yaw, pitch, roll].

    Matches pinocchio's matrixToRpy (reversed), with pitch in (-pi/2, pi/2)
    away from the gimbal singularity.
    """
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def quat_wxyz_to_matrix(q):
    """MuJoCo wxyz quaternion -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat_wxyz(R):
    """Rotation matrix -> wxyz quaternion (w >= 0). Branch-free (jit-safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate computations; pick the numerically best one.
    qw_0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    cand0 = jnp.stack(
        [qw_0, (m21 - m12) / (4 * qw_0), (m02 - m20) / (4 * qw_0), (m10 - m01) / (4 * qw_0)],
        axis=-1,
    )
    qx_1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    cand1 = jnp.stack(
        [(m21 - m12) / (4 * qx_1), qx_1, (m01 + m10) / (4 * qx_1), (m02 + m20) / (4 * qx_1)],
        axis=-1,
    )
    qy_2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    cand2 = jnp.stack(
        [(m02 - m20) / (4 * qy_2), (m01 + m10) / (4 * qy_2), qy_2, (m12 + m21) / (4 * qy_2)],
        axis=-1,
    )
    qz_3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    cand3 = jnp.stack(
        [(m10 - m01) / (4 * qz_3), (m02 + m20) / (4 * qz_3), (m12 + m21) / (4 * qz_3), qz_3],
        axis=-1,
    )
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def local_angular_to_euler_rate(ypr, w_local):
    """Body-frame angular velocity -> d/dt [yaw, pitch, roll].

    Same map as the reference (`transform.py:72-78`).
    """
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cx, sx = jnp.cos(r), jnp.sin(r)
    cy, sy = jnp.cos(p), jnp.sin(p)
    row0 = jnp.stack([jnp.zeros_like(cx), sx / cy, cx / cy], axis=-1)
    row1 = jnp.stack([jnp.zeros_like(cx), cx, -sx], axis=-1)
    row2 = jnp.stack([jnp.ones_like(cx), sx * sy / cy, cx * sy / cy], axis=-1)
    T = jnp.stack([row0, row1, row2], axis=-2)
    return (T @ w_local[..., None])[..., 0]


def euler_rate_to_local_angular(ypr, ypr_rate):
    """d/dt [yaw, pitch, roll] -> body-frame angular velocity.

    Same map as the reference (`transform.py:80-86`).
    """
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cx, sx = jnp.cos(r), jnp.sin(r)
    cy, sy = jnp.cos(p), jnp.sin(p)
    row0 = jnp.stack([-sy, jnp.zeros_like(cx), jnp.ones_like(cx)], axis=-1)
    row1 = jnp.stack([cy * sx, cx, jnp.zeros_like(cx)], axis=-1)
    row2 = jnp.stack([cx * cy, -sx, jnp.zeros_like(cx)], axis=-1)
    T = jnp.stack([row0, row1, row2], axis=-2)
    return (T @ ypr_rate[..., None])[..., 0]
