"""State-chart conversions between MuJoCo and the Euler-chart model.

MuJoCo free-joint state: qpos = [p(3), quat wxyz(4), joints(12)],
qvel = [v_lin world(3), omega body-local(3), joint rates(12)].

Model chart (reference convention, `mpc_controller/utils/dynamics.py:52-99`):
q = [p(3), (yaw,pitch,roll)(3), joints(12)], v = dq/dt — world-frame linear
velocity and ZYX Euler-angle rates.

All functions are jnp + batched over leading dims where noted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math3d import (
    euler_rate_to_local_angular,
    local_angular_to_euler_rate,
    matrix_to_quat_wxyz,
    matrix_to_ypr,
    quat_wxyz_to_matrix,
    ypr_to_matrix,
)


def quat_state_to_ypr_state(q_mj: jax.Array) -> jax.Array:
    """MuJoCo qpos (19,) -> Euler-chart q (18,). Batched over leading dims."""
    R = quat_wxyz_to_matrix(q_mj[..., 3:7])
    ypr = matrix_to_ypr(R)
    return jnp.concatenate([q_mj[..., :3], ypr, q_mj[..., 7:]], axis=-1)


def ypr_state_to_quat_state(q: jax.Array) -> jax.Array:
    """Euler-chart q (18,) -> MuJoCo qpos (19,). Batched."""
    quat = matrix_to_quat_wxyz(ypr_to_matrix(q[..., 3:6]))
    return jnp.concatenate([q[..., :3], quat, q[..., 6:]], axis=-1)


def vel_from_mujoco(q: jax.Array, v_mj: jax.Array) -> jax.Array:
    """MuJoCo qvel -> chart velocity (Euler rates), given chart q. Batched."""
    ypr_rate = local_angular_to_euler_rate(q[..., 3:6], v_mj[..., 3:6])
    return jnp.concatenate([v_mj[..., :3], ypr_rate, v_mj[..., 6:]], axis=-1)


def vel_to_mujoco(q: jax.Array, v: jax.Array) -> jax.Array:
    """Chart velocity -> MuJoCo qvel, given chart q. Batched."""
    w_local = euler_rate_to_local_angular(q[..., 3:6], v[..., 3:6])
    return jnp.concatenate([v[..., :3], w_local, v[..., 6:]], axis=-1)


def convert_from_mujoco(q_mj: jax.Array, v_mj: jax.Array):
    """(qpos, qvel) -> chart (q, v). Mirrors `dynamics.py:52-71`. Batched."""
    q = quat_state_to_ypr_state(q_mj)
    return q, vel_from_mujoco(q, v_mj)


def convert_to_mujoco(q: jax.Array, v: jax.Array):
    """Chart (q, v) -> (qpos, qvel). Mirrors `dynamics.py:73-99`. Batched."""
    return ypr_state_to_quat_state(q), vel_to_mujoco(q, v)


def v_global_to_local(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate the base linear velocity into the base frame (utility mirroring
    the reference's global->local adjoint, `transform.py:164-216`; the 44-dim
    policy state itself uses raw MuJoCo-chart velocities — learning/obs.py)."""
    R_WB = ypr_to_matrix(q[..., 3:6])
    v_loc = jnp.einsum("...ji,...j->...i", R_WB, v[..., :3])
    return jnp.concatenate([v_loc, v[..., 3:]], axis=-1)
