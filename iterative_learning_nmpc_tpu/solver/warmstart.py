"""Learned-policy warm starts for the NMPC solver.

The BASELINE.json north star: "learned-policy warm-starts feed back into the
solver to cut iterations". A cheap kinematic rollout of the policy's joint
PD targets over the horizon produces an (X, U) initial guess that is
gait-shaped instead of stationary — cutting the SQP iterations a cold solve
needs (and therefore the latency of the first solve / recovery-after-
divergence path, where no shifted previous solution exists).

Fully on device and jit/vmap-friendly: `apply_fn` is any (47,) -> (12,)
policy (e.g. the fused Pallas kernel from ops/policy_kernel.py or a Flax
apply).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..models import dynamics as dyn
from ..ocp.problem import OCPParams
from ..robots.spec import RobotSpec


from ..learning.obs import policy_input as _obs_policy_input


def _policy_input(spec, q, v, v_des):
    return _obs_policy_input(spec, q, v, v_des)


def policy_warmstart(
    solver,
    apply_fn: Callable,
    params: OCPParams,
    v_des,
    kp: float = 20.0,
    kd: float = 1.5,
) -> Tuple[jax.Array, jax.Array]:
    """Kinematic policy rollout over the horizon -> (X, U) warm start.

    Joints track the policy's PD targets with the closed-loop first-order
    constant tau = kd/kp; the base integrates the commanded velocity at the
    nominal height; forces take the per-node gravity share.
    """
    spec: RobotSpec = solver.spec
    N = solver.N
    dt = solver.dt_nodes
    alpha = 1.0 - jnp.exp(-dt * kp / kd)
    x0 = params.x0
    v_des = jnp.asarray(v_des, x0.dtype)

    def step(carry, cnt_k):
        q, v = carry
        target = apply_fn(_policy_input(spec, q, v, v_des))
        qj_new = q[6:] + alpha * (target - q[6:])
        q_new = jnp.concatenate([
            q[:2] + v_des[:2] * dt,
            q[2:3] * 0.0 + q[2:3],          # hold height
            q[3:6],                          # hold attitude
            qj_new,
        ])
        v_new = jnp.concatenate([
            v_des[:2], jnp.zeros(1, x0.dtype), jnp.zeros(3, x0.dtype),
            (qj_new - q[6:]) / dt,
        ])
        return (q_new, v_new), (q_new, v_new)

    (qN, vN), (Qs, Vs) = jax.lax.scan(
        step, (x0[:18], x0[18:]), params.cnt[:, 1:].T
    )
    X = jnp.concatenate(
        [x0[None], jnp.concatenate([Qs, Vs], axis=1)], axis=0
    )
    # inputs: accelerations from velocity finite differences; gravity forces
    V_all = X[:, 18:]
    A_u = (V_all[1:] - V_all[:-1]) / dt
    m_tot = spec.mass.sum() if spec.mass.ndim == 1 else spec.mass[..., :].sum()
    n_active = jnp.maximum(params.cnt[:, :-1].sum(0), 1.0)
    fz = 9.81 * m_tot / n_active
    f = jnp.zeros((N, 4, 3), x0.dtype).at[:, :, 2].set(
        params.cnt[:, :-1].T * fz[:, None]
    )
    U = jnp.concatenate([A_u, f.reshape(N, 12)], axis=1)
    return X, U
