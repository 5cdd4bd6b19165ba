"""Gait machine semantics + multi-gait solver smoke + rollout variants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.gait.planner import (
    AcyclicContactPlanner,
    ContactPlanner,
    CustomContactPlanner,
    RaibertContactPlanner,
)
from iterative_learning_nmpc_tpu.mpc.config import GAITS, get_quadruped_config


def test_trot_bitmap():
    gait = GAITS["trot"]
    p = ContactPlanner(["FL", "FR", "RL", "RR"], 0.04, gait)
    # trot: diagonal pairs alternate; ~half the cycle in stance
    seq = p.gait_sequence
    assert seq.shape == (4, round(0.5 / 0.04))
    np.testing.assert_array_equal(seq[0], seq[3])  # FL == RR
    np.testing.assert_array_equal(seq[1], seq[2])  # FR == RL
    np.testing.assert_array_equal(seq[0] + seq[1], np.ones_like(seq[0]))
    # window tiling wraps the cycle
    w = p.get_contacts(3, 26)
    assert w.shape == (4, 26)
    np.testing.assert_array_equal(w[:, 0], p.gait_sequence[:, 3])
    # peaks are the complement
    np.testing.assert_array_equal(p.get_peaks(0, 13), 1 - p.get_contacts(0, 13))


def test_all_gaits_construct():
    for name, gait in GAITS.items():
        p = ContactPlanner(["FL", "FR", "RL", "RR"], 0.04, gait)
        c = p.get_contacts(0, 26)
        assert c.shape == (4, 26)
        assert c.min() >= 0 and c.max() <= 1


def test_raibert_locations():
    gait = GAITS["trot"]
    p = RaibertContactPlanner(
        ["FL", "FR", "RL", "RR"], 0.04, gait,
        offset_hip_b=np.array([[0.19, 0.14, 0], [0.19, -0.14, 0],
                               [-0.19, 0.14, 0], [-0.19, -0.14, 0]]),
        cache_cnt=True,
    )
    v_des = np.array([0.4, 0.0, 0.0])
    p.set_state(pos=np.zeros(3), v_w=np.zeros(3), ypr=np.zeros(3),
                com_xyz=np.array([0.0, 0.0, 0.3]), v_des=v_des)
    loc = p.get_locations(0, 26)
    assert loc.shape == (4, 26, 3)
    placed = loc[np.any(loc != 0, axis=-1)]
    assert len(placed) > 0
    # footsteps step ahead of the hips when walking forward
    assert placed[:, 0].max() > 0.19
    # caching: same nodes give identical locations on replan
    loc2 = p.get_locations(0, 26)
    np.testing.assert_array_equal(loc, loc2)


def test_custom_planner():
    gait = GAITS["trot"]
    p = CustomContactPlanner(["FL", "FR", "RL", "RR"], 0.04, gait)
    cl = np.tile(np.array([[0.2, 0.1, 0.0]]), (3, 4, 1))
    cl[1, :, 0] = 0.4
    p.set_contact_locations(cl)
    loc = p.get_locations(0, 26)
    assert loc.shape == (4, 26, 3)
    # beyond the plan, the last locations repeat
    loc_end = p.get_locations(1000, 26)
    np.testing.assert_array_equal(loc_end[:, -1], cl[-1])
    # custom periodic sequence
    seq = np.roll(p.gait_sequence, 2, axis=1)
    p.set_periodic_sequence(seq)
    np.testing.assert_array_equal(p.get_contacts(0, seq.shape[1]), seq)


def test_acyclic_planner():
    p = AcyclicContactPlanner()
    seq = np.ones((4, 10), dtype=np.int64)
    seq[:, 4:7] = 0
    p.set_sequence(seq)
    w = p.get_sequence(8, 6)
    # clamps at the last node
    np.testing.assert_array_equal(w[:, 2:], 1)
    np.testing.assert_array_equal(p.get_peak(8, 6), 1 - w)


@pytest.mark.slow
@pytest.mark.parametrize("gait_name", ["trot", "slow_trot"])
def test_gait_solves_converge(go2, gait_name):
    """Every cataloged (go2, gait) pair produces a finite feasible solve."""
    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params

    gait, opt, cost = get_quadruped_config(gait_name, "go2")
    solver = TrajOptSolver(go2, opt, cost)
    planner = ContactPlanner(go2.feet_frame_names, solver.dt_nodes, gait)
    q0 = jnp.asarray(go2.q_home)
    p0 = dyn.foot_positions(go2, q0)
    q0 = q0.at[2].add(-p0[0, 2])
    x0 = np.concatenate([np.asarray(q0), np.zeros(18)])
    cnt = planner.get_contacts(0, solver.N + 1)
    base_ref = np.zeros(12)
    base_ref[:3] = np.asarray(q0[:3])
    base_ref[2] = gait.nom_height
    params = make_params(solver, x0, cnt, base_ref=base_ref,
                         step_height=gait.step_height)
    X, U = jax.jit(solver.cold_start)(params)
    sol = jax.jit(lambda X, U, p: solver.solve(X, U, p, 10))(X, U, params)
    assert np.isfinite(float(sol.stats.cost))
    assert float(sol.stats.defect) < 1e-3
    q = np.asarray(sol.q)
    assert np.all(np.abs(q[:, 3:6]) < 0.5)  # stays roughly upright


@pytest.mark.slow
def test_phase_shift_rollout(go2, tmp_path):
    """Nullspace-perturbed mid-trajectory restart keeps walking."""
    from iterative_learning_nmpc_tpu.learning.rollouts import (
        rollout_mpc,
        rollout_mpc_phase_shift,
    )

    nominal = rollout_mpc(go2, sim_time=1.2, v_des=np.array([0.3, 0, 0]),
                          record_dir=str(tmp_path))
    assert not nominal.early_termination
    out = rollout_mpc_phase_shift(
        go2, nominal.record_path, step=600, rng=np.random.default_rng(0),
        sim_time=1.0, v_des=np.array([0.3, 0, 0]), record_dir=str(tmp_path),
    )
    # perturbed restart may or may not fall; it must at least run and record
    assert out.sim.n_steps > 200


@pytest.mark.slow
def test_acyclic_mpc_with_patches(go2):
    """AcyclicMPC end-to-end (reference mpc_acyclic.py:8-86): externally
    supplied contact sequence + patches; one replan; stance feet stay inside
    the patch radius."""
    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    from iterative_learning_nmpc_tpu.mpc.acyclic import AcyclicMPC

    mpc = AcyclicMPC(go2, gait_name="trot", n_sqp_first=15, solve_async=False,
                     compute_timings=False)
    N = mpc.config_opt.n_nodes
    gait, _, _ = get_quadruped_config("trot", "go2")
    cp = ContactPlanner(go2.feet_frame_names, mpc.solver.dt_nodes, gait)
    T = 2 * (N + 1)
    mpc.set_contact_sequence(cp.get_contacts(0, T))

    q0 = np.asarray(go2.q_home, np.float64).copy()
    p0 = np.asarray(dyn.foot_positions(go2, jnp.asarray(q0)))
    q0[2] += -p0[0, 2] + float(np.asarray(go2.foot_radius))
    p_feet = np.asarray(dyn.foot_positions(go2, jnp.asarray(q0)))

    centers = np.zeros((4, T, 3), np.float32)
    centers[:, :, :2] = p_feet[:, None, :2]
    rotations = np.zeros((4, T), np.float32)          # yaw-aligned patches
    sizes = np.full((4, T, 2), 0.06, np.float32)      # 6 cm square -> r=3 cm
    mpc.set_patches(centers, rotations, sizes)

    mpc.set_command(np.array([0.2, 0.0, 0.0]), 0.0)
    q_plan, v_plan, a_plan, f_plan, tau_ff = mpc.optimize(q0, np.zeros(18))

    assert q_plan.shape[1] == 18 and np.isfinite(q_plan).all()
    # node-resolution solution: stance feet inside their patches
    X = np.asarray(mpc._X_prev)                        # (N+1, 36)
    feet = np.asarray(
        jax.vmap(lambda x: dyn.foot_positions(go2, x[:18]))(jnp.asarray(X))
    )[:, :, :2]
    cnt = mpc.acyclic_planner.get_sequence(0, N + 1).T  # (N+1, 4)
    dist = np.linalg.norm(feet - p_feet[None, :, :2], axis=2) * cnt
    assert dist.max() < 0.03 + 3e-3, dist.max()
    # plan keeps a sane base height
    assert np.all(q_plan[:, 2] > 0.18) and np.all(q_plan[:, 2] < 0.42)


@pytest.mark.slow
def test_acyclic_standing_hop(go2):
    """Standing hop through the acyclic path (the 'jump' role of the
    reference's contact-sequence API): a 0.16 s ALL-FLIGHT window in the
    schedule makes the solver plan a ballistic arc — zero contact forces in
    flight, takeoff velocity, ~0.1 m apex gain — and the closed loop takes
    off, lands, and recovers. Measured: plan apex 0.385 m from 0.287 m
    stance, sim z max 0.356 m, landing upright."""
    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    from iterative_learning_nmpc_tpu.mpc.acyclic import AcyclicMPC
    from iterative_learning_nmpc_tpu.sim.mujoco_sim import Simulator

    mpc = AcyclicMPC(go2, gait_name="trot", n_sqp_first=30,
                     solve_async=False)
    N = mpc.config_opt.n_nodes
    T = 80
    cnt = np.ones((4, T))
    cnt[:, 10:14] = 0.0                       # 4 flight nodes = 0.16 s
    mpc.set_contact_sequence(cnt)

    q0 = np.asarray(go2.q_home, np.float64).copy()
    p0 = np.asarray(dyn.foot_positions(go2, jnp.asarray(q0)))
    q0[2] += -p0[0, 2] + float(np.asarray(go2.foot_radius))
    mpc.set_command(np.array([0.0, 0.0, 0.0]), 0.0)

    mpc.optimize(q0, np.zeros(18))
    X = np.asarray(mpc._X_prev)
    F = np.asarray(mpc._U_prev)[:, 18:].reshape(N, 4, 3)
    z0 = X[0, 2]
    assert np.abs(F[10:14]).max() == 0.0      # ballistic: no flight forces
    assert X[:, 2].max() > z0 + 0.05          # apex gain in the plan
    assert X[11, 20] > 0.2                    # upward takeoff velocity

    sim = Simulator(go2)
    res = sim.run(sim_time=2.5, controller=mpc, stop_on_fall=True)
    q = np.vstack(mpc.q_full)
    assert not res.fell, res
    assert q[:, 2].max() > z0 + 0.04          # it actually left the ground
    assert 0.25 < q[-1, 2] < 0.33             # landed + recovered stance
    assert np.abs(q[:, 5]).max() < 0.05       # roll stays small
