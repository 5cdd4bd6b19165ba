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
    sim_dt: float = 1.0e-3,
) -> Tuple[jax.Array, jax.Array]:
    """Device-plant policy rollout over the horizon -> (X, U) warm start.

    The policy's PD targets drive the soft-contact device simulator
    (sim/jax_sim) for the N-node horizon — one policy inference per node,
    PD at the control rate over the interval — and the node-boundary
    states, finite-difference accelerations, and contact-model forces form
    the initial guess. The rollout IS a feasible trajectory of a nearby
    plant, so defects start near zero and the GN steps go into optimality
    rather than feasibility.

    DESIGN NOTE (measured): a purely kinematic integration of the policy
    targets (first-order joint tracking + commanded-velocity base) was
    tried first and is strictly worse than the stationary cold start
    (13-14 vs 6-7 iterations-to-tol on the trot states) because the guess
    is dynamically inconsistent — and without saturation the open-loop MLP
    drifts out of distribution and NaNs the solve. The plant rollout costs
    ~N policy inferences + N*40 sim steps (one fused scan on device) and
    turns the warm start into a real iteration cut (see
    tests/test_policy_warmstart.py and BENCH_WARMSTART.json).
    """
    from ..sim import jax_sim

    spec: RobotSpec = solver.spec
    N = solver.N
    dt = solver.dt_nodes
    steps = max(1, int(round(dt / sim_dt)))
    x0 = params.x0
    v_des = jnp.asarray(v_des, x0.dtype)
    jl = jnp.asarray(spec.joint_limits, x0.dtype)
    tl = jnp.asarray(spec.torque_limit, x0.dtype)
    cp = jax_sim.contact_params_for(spec)

    def node(st, k):
        target = apply_fn(_policy_input(spec, st.q, st.v, v_des))
        target = jnp.clip(target, jl[:, 0], jl[:, 1])

        def ctrl(s, _):
            tau = jnp.clip(kp * (target - s.q[6:]) - kd * s.v[6:], -tl, tl)
            return jax_sim.step(spec, s, tau, cp, sim_dt), None

        st2, _ = jax.lax.scan(ctrl, st, None, length=steps)
        f = jax_sim.contact_forces(spec, st2.q, st2.v, cp)
        return st2, (st2.q, st2.v, f)

    st0 = jax_sim.SimState(x0[:18], x0[18:], jnp.asarray(0.0, x0.dtype))
    _, (Qs, Vs, Fs) = jax.lax.scan(node, st0, jnp.arange(N))
    X = jnp.concatenate(
        [x0[None], jnp.concatenate([Qs, Vs], axis=1)], axis=0
    )
    V_all = X[:, 18:]
    A_u = (V_all[1:] - V_all[:-1]) / dt
    # plan-consistent forces: contact-model forces where the PLAN says
    # stance (masking, never branching), zero on planned swing nodes
    f = Fs * params.cnt[:, :-1].T[:, :, None]
    U = jnp.concatenate([A_u, f.reshape(N, 12)], axis=1)
    return X, U
