"""GN-SQP solver unit/behavior tests (the oracle role HPIPM can't play for
itself — see SURVEY.md §4: golden-value + property tests per layer)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.gait.planner import ContactPlanner
from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params


@pytest.fixture(scope="module")
def trot_setup(go2):
    gait, opt, cost = get_quadruped_config("trot", "go2")
    solver = TrajOptSolver(go2, opt, cost)
    q0 = jnp.asarray(go2.q_home)
    p0 = dyn.foot_positions(go2, q0)
    q0 = q0.at[2].add(-p0[0, 2])
    x0 = jnp.concatenate([q0, jnp.zeros(18)])
    solve = jax.jit(lambda X, U, p, n: solver.solve(X, U, p, n), static_argnums=3)
    return gait, opt, cost, solver, q0, x0, solve


def test_standing_balance(go2, trot_setup):
    gait, opt, cost, solver, q0, x0, solve = trot_setup
    N = solver.N
    cnt = jnp.ones((4, N + 1), jnp.float32)
    base_ref = jnp.zeros(12).at[:3].set(q0[:3]).at[2].set(gait.nom_height)
    params = make_params(solver, x0, cnt, base_ref=base_ref, step_height=gait.step_height)
    X, U = solver.cold_start(params)
    sol = solve(X, U, params, 15)

    # multiple-shooting feasibility: linear dynamics -> defects ~ 0
    assert float(sol.stats.defect) < 1e-4
    # gravity share per foot
    mg4 = 9.81 * float(np.asarray(go2.mass).sum()) / 4
    np.testing.assert_allclose(np.asarray(sol.f[0, :, 2]), mg4, rtol=0.15)
    # no sag across the horizon
    assert np.all(np.asarray(sol.q[:, 2]) > 0.24)
    # friction cone respected within the AL-bounded tolerance (<= 0.5 N —
    # the inner QP loop anneals the hinge duals until qp_tol is met)
    f = np.asarray(sol.f)
    assert np.all(f[:, :, 2] > -1e-3)
    assert np.all(np.abs(f[:, :, 0]) <= opt.mu * f[:, :, 2] + 0.5)


def test_trot_solution_shape(go2, trot_setup):
    gait, opt, cost, solver, q0, x0, solve = trot_setup
    N = solver.N
    planner = ContactPlanner(go2.feet_frame_names, solver.dt_nodes, gait)
    cnt = jnp.asarray(planner.get_contacts(0, N + 1), jnp.float32)
    base_ref = jnp.zeros(12).at[:3].set(q0[:3]).at[2].set(gait.nom_height).at[6].set(0.3)
    params = make_params(
        solver, x0, cnt, base_ref=base_ref,
        base_ref_e=base_ref.at[0].add(0.3), step_height=gait.step_height,
    )
    X, U = solver.cold_start(params)
    sol = solve(X, U, params, 15)

    assert float(sol.stats.defect) < 1e-4
    assert np.isfinite(float(sol.stats.cost))
    q = np.asarray(sol.q)
    # base advances in x and stays at a sane height
    assert q[-1, 0] > 0.1
    assert np.all(q[:, 2] > 0.2) and np.all(q[:, 2] < 0.4)
    # swing feet clear the ground and approach step height
    feet_z = np.asarray(jax.vmap(lambda qq: dyn.foot_positions(go2, qq))(sol.q))[:, :, 2]
    cnt_np = np.asarray(cnt).T  # (N+1, 4)
    swing_apex = (feet_z * (1 - cnt_np)).max()
    assert 0.03 < swing_apex < 0.09
    # swing forces are exactly masked to zero in the effective dynamics
    f = np.asarray(sol.f)
    swing_mask = (1 - cnt_np[:-1])[:, :, None]
    assert np.abs(f * swing_mask).max() < 2.0  # pinned near zero by rf_zero


def test_line_search_tie_break(go2, trot_setup):
    """The merit argmax must resolve near-ties DETERMINISTICALLY to the
    largest alpha (ADVICE r3): backends produce ulp-level merit
    differences, and a bare argmin then picks different alphas per backend
    at near-ties, compounding into ~5e-3 cross-backend trajectory
    divergence over multiple SQP iterations. Contract pinned here:
    (a) steps too small to change the merit beyond the tie tolerance select
    alpha = 1.0 (NOT an arbitrary grid position), (b) a genuinely better
    small-alpha candidate still wins strictly (the tolerance must not merge
    distinct minima)."""
    gait, opt, cost, solver, q0, x0, solve = trot_setup
    N = solver.N
    cnt = jnp.ones((4, N + 1), jnp.float32)
    base_ref = jnp.zeros(12).at[:3].set(q0[:3]).at[2].set(gait.nom_height)
    params = make_params(solver, x0, cnt, base_ref=base_ref,
                         step_height=gait.step_height)
    X, U = solver.cold_start(params)
    sol = solve(X, U, params, 15)
    rho = jnp.asarray(1.0, sol.X.dtype)
    zero_def = jnp.zeros((N, 18), sol.X.dtype)

    # (a) ulp-scale step: every alpha's merit ties -> largest alpha wins
    dX1 = jnp.full_like(sol.X, 1e-7)
    dU1 = jnp.full_like(sol.U, 1e-7)
    sel = jax.jit(solver._merit_select)
    _, _, _, _, a = sel(sol.X, sol.U, params, dX1, dU1, zero_def, rho, None)
    assert float(a) == 1.0

    # (b) an overshooting direction (merit grows steeply with alpha) must
    # still strictly select the smallest-alpha candidate
    dU_big = jnp.ones_like(sol.U) * 50.0
    _, _, _, _, a2 = sel(sol.X, sol.U, params, jnp.zeros_like(sol.X),
                         dU_big, zero_def, rho, None)
    assert float(a2) == float(np.float32(min(opt.ls_alphas)))


def test_warmstart_shift_rti(go2, trot_setup):
    """One RTI iteration from a shifted converged plan stays feasible and
    close to a fresh 15-iteration solve (the reference's steady-state regime,
    mpc_opt.py:25)."""
    gait, opt, cost, solver, q0, x0, solve = trot_setup
    N = solver.N
    planner = ContactPlanner(go2.feet_frame_names, solver.dt_nodes, gait)

    def params_at(node, x0_):
        cnt = jnp.asarray(planner.get_contacts(node, N + 1), jnp.float32)
        base_ref = jnp.zeros(12).at[:3].set(q0[:3]).at[2].set(gait.nom_height).at[6].set(0.3)
        return make_params(solver, x0_, cnt, base_ref=base_ref, step_height=gait.step_height)

    p0 = params_at(0, x0)
    X, U = solver.cold_start(p0)
    sol0 = solve(X, U, p0, 15)

    # advance one node: warm start = shift by 1
    x1 = sol0.X[1]
    p1 = params_at(1, x1)
    Xw, Uw = solver.shift_warmstart(sol0.X, sol0.U, 1)
    sol_rti = solve(Xw, Uw, p1, 1)
    sol_full = solve(Xw, Uw, p1, 15)

    assert float(sol_rti.stats.defect) < 1e-4
    # one RTI iteration improves on the raw warm start and lands within 2x of
    # the fully converged cost (the tail node sees a brand-new contact state,
    # which a single GN step cannot fully absorb)
    cost_ws = float(solver._total_cost(Xw.at[0].set(p1.x0), Uw, p1))
    assert float(sol_rti.stats.cost) < cost_ws
    assert float(sol_rti.stats.cost) < 2.0 * float(sol_full.stats.cost) + 1.0


def test_patch_radius_hinge(go2, trot_setup):
    """Hard contact-patch restriction (reference range_radius,
    solver.py:254-275): walking trot with patches fixed at the initial
    footholds — re-landing feet must touch down within the patch radius,
    while the unrestricted solve steps well beyond it."""
    gait, opt, cost, solver, q0, x0, solve = trot_setup
    N = solver.N
    planner = ContactPlanner(go2.feet_frame_names, solver.dt_nodes, gait)
    cnt = jnp.asarray(planner.get_contacts(0, N + 1), jnp.float32)
    base_ref = (
        jnp.zeros(12).at[:3].set(q0[:3]).at[2].set(gait.nom_height).at[6].set(0.3)
    )
    p_feet0 = np.asarray(dyn.foot_positions(go2, q0))
    cnt_loc = np.zeros((4, N + 1, 3), np.float32)
    cnt_loc[:, :, :2] = p_feet0[:, None, :2]
    radius = 0.02

    def solve_with(restrict):
        params = make_params(
            solver, x0, cnt, cnt_loc=cnt_loc,
            patch_radius=np.full((4, N + 1), radius, np.float32),
            restrict=restrict, base_ref=base_ref,
            base_ref_e=base_ref.at[0].add(0.3), step_height=gait.step_height,
        )
        X, U = solver.cold_start(params)
        sol = solve(X, U, params, 15)
        feet = np.asarray(
            jax.vmap(lambda qq: dyn.foot_positions(go2, qq))(sol.q)
        )[:, :, :2]                                   # (N+1, 4, 2)
        dist = np.linalg.norm(feet - cnt_loc.transpose(1, 0, 2)[:, :, :2], axis=2)
        return sol, dist * np.asarray(cnt).T          # stance nodes only

    sol_tight, dist_tight = solve_with(1.0)
    sol_free, dist_free = solve_with(0.0)

    assert float(sol_tight.stats.defect) < 1e-4
    # hinge binds: every stance foot within the patch (+3 mm penalty slack)
    assert dist_tight.max() < radius + 3e-3, dist_tight.max()
    # unrestricted, the 0.3 m/s gait steps well past the patches
    assert dist_free.max() > 2 * radius, dist_free.max()


def test_structured_riccati_matches_generic(go2, trot_setup):
    """The double-integrator-specialized sweep == the generic oracle."""
    from iterative_learning_nmpc_tpu.solver.sqp import (
        _forward_delta,
        _forward_delta_structured,
        _riccati_solve,
        _riccati_solve_structured,
    )

    gait, opt, cost, solver, q0, x0, solve = trot_setup
    N, nx, nu = solver.N, 36, 30
    rng = np.random.RandomState(7)
    mk = lambda *s: rng.randn(*s).astype(np.float32)
    Jq = mk(N, 50, nx)
    Jr = mk(N, 50, nu)
    Q = np.einsum("nri,nrj->nij", Jq, Jq) + 1e-3 * np.eye(nx, dtype=np.float32)
    R = np.einsum("nri,nrj->nij", Jr, Jr) + 1.0 * np.eye(nu, dtype=np.float32)
    M = 0.1 * np.einsum("nri,nrj->nij", Jq, Jr)
    qx, ru = mk(N, nx), mk(N, nu)
    PT = mk(60, nx)
    P_N = PT.T @ PT + np.eye(nx, dtype=np.float32)
    p_N = mk(nx)
    d = 0.01 * mk(N, nx)
    h = solver.dt_nodes
    A, B = solver.A, solver.B
    lm = np.float32(1e-6)

    K0, k0 = jax.jit(_riccati_solve)(
        jnp.asarray(A), jnp.asarray(B), Q, R, M, qx, ru, P_N, p_N, d, lm)
    K1, k1 = jax.jit(lambda *a: _riccati_solve_structured(h, *a))(
        Q, R, M, qx, ru, P_N, p_N, d, lm)
    scale = float(jnp.max(jnp.abs(K0)))
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K0), atol=2e-3 * scale)
    kscale = max(1.0, float(jnp.max(jnp.abs(k0))))
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k0), atol=2e-3 * kscale)

    dx0 = mk(nx)
    dX0, dU0 = jax.jit(_forward_delta)(
        jnp.asarray(A), jnp.asarray(B), K0, k0, d, dx0, 0.7)
    dX1, dU1 = jax.jit(lambda K, k: _forward_delta_structured(h, K, k, d, dx0, 0.7))(
        K0, k0)
    np.testing.assert_allclose(np.asarray(dX1), np.asarray(dX0), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dU1), np.asarray(dU0), atol=1e-4, rtol=1e-4)
