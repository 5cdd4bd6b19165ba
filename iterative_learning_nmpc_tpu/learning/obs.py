"""The policy observation contract, on device (single source of truth).

state(44) = [phase(1), qvel_mj(18), qpos_mj[2:](17), base_wrt_feet(8)]
(`Rollout_MPC.py:270-275`); input(47) = [state, v_des]. The numpy twin for
the host recorder lives in learning/recorder.py:assemble_state — the two are
pinned against each other by tests.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models import dynamics as dyn
from ..models.transforms import convert_to_mujoco
from ..robots.spec import RobotSpec


def policy_state(spec: RobotSpec, q, v, phase=0.0):
    """(44,) observation from a chart state (jit/vmap-friendly)."""
    q_mj, v_mj = convert_to_mujoco(q, v)
    p_feet = dyn.foot_positions(spec, q)
    base_wrt_feet = (q_mj[None, :3] - p_feet)[:, :2].reshape(-1)
    return jnp.concatenate(
        [jnp.full((1,), phase, q.dtype), v_mj, q_mj[2:], base_wrt_feet]
    )


def policy_input(spec: RobotSpec, q, v, v_des, phase=0.0):
    """(47,) network input: observation + velocity goal."""
    return jnp.concatenate([policy_state(spec, q, v, phase), jnp.asarray(v_des, q.dtype)])
