"""Solver robustness fuzz: random states / contact patterns / warm starts
must never produce NaNs or unbounded steps (the LM-regularized GN-SQP with
masked contact switching has no data-dependent branches to hide in)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params


@pytest.mark.slow
def test_solver_fuzz_random_instances(go2):
    """One vmapped solve over a fuzz batch: random base pose/velocity
    perturbations, random contact bitmaps (including all-swing 'flight'
    and all-stance nodes), random force warm starts."""
    gait, opt, cost = get_quadruped_config("trot", "go2")
    solver = TrajOptSolver(go2, opt, cost)
    N = solver.N
    rng = np.random.RandomState(0)
    B = 8

    q0 = np.asarray(go2.q_home, np.float64).copy()
    p0 = np.asarray(jax.jit(lambda q: dyn.foot_positions(go2, q))(
        jnp.asarray(q0)))
    q0[2] += -p0[0, 2] + float(np.asarray(go2.foot_radius))

    x0s, cnts = [], []
    for b in range(B):
        x0 = np.concatenate([q0, np.zeros(18)])
        x0[:3] += rng.uniform(-0.1, 0.1, 3)
        x0[3:6] += rng.uniform(-0.3, 0.3, 3)          # tilted base
        x0[6:18] += rng.uniform(-0.2, 0.2, 12)
        x0[18:24] = rng.uniform(-1.0, 1.0, 6)         # flying base rates
        x0[24:] = rng.uniform(-2.0, 2.0, 12)
        x0s.append(x0)
        if b == 0:
            cnt = np.zeros((4, N + 1))                # full flight
        elif b == 1:
            cnt = np.ones((4, N + 1))                 # full stance
        else:
            cnt = (rng.rand(4, N + 1) > 0.4).astype(np.float64)
        cnts.append(cnt)

    params = [make_params(solver, x0s[b], cnts[b],
                          base_ref=np.concatenate(
                              [x0s[b][:3], np.zeros(9)]),
                          step_height=gait.step_height) for b in range(B)]
    pb = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
    Xb, Ub = jax.jit(jax.vmap(solver.cold_start))(pb)
    # random force warm start on top
    Ub = Ub + jnp.asarray(rng.uniform(-5, 5, Ub.shape))

    sols = jax.jit(jax.vmap(
        lambda X, U, p: solver.solve(X, U, p, 3)))(Xb, Ub, pb)

    assert np.isfinite(np.asarray(sols.X)).all()
    assert np.isfinite(np.asarray(sols.U)).all()
    assert np.isfinite(np.asarray(sols.stats.cost)).all()
    # defects contract toward feasibility, never blow up
    assert float(jnp.max(sols.stats.defect)) < 10.0
    # inequality duals stay in their clipped range
    assert np.isfinite(np.asarray(sols.lam_ineq)).all()
    assert float(jnp.min(sols.lam_ineq)) >= 0.0


@pytest.mark.slow
def test_solver_fuzz_degenerate_references(go2):
    """Hostile references (far-away targets, zero dt headroom on bounds)
    keep the step bounded — the parallel line search + LM regularization
    must absorb them without NaN."""
    gait, opt, cost = get_quadruped_config("trot", "go2")
    solver = TrajOptSolver(go2, opt, cost)
    N = solver.N
    rng = np.random.RandomState(7)

    q0 = np.asarray(go2.q_home, np.float64).copy()
    p0 = np.asarray(jax.jit(lambda q: dyn.foot_positions(go2, q))(
        jnp.asarray(q0)))
    q0[2] += -p0[0, 2] + float(np.asarray(go2.foot_radius))
    x0 = np.concatenate([q0, np.zeros(18)])

    cnt = (rng.rand(4, N + 1) > 0.5).astype(np.float64)
    base_ref = np.zeros(12)
    base_ref[:3] = [5.0, -5.0, 2.0]                   # absurd target
    base_ref[6] = 10.0                                 # absurd velocity
    params = make_params(solver, x0, cnt, base_ref=base_ref,
                         step_height=gait.step_height)
    X, U = jax.jit(solver.cold_start)(params)
    sol = jax.jit(lambda X, U, p: solver.solve(X, U, p, 5))(X, U, params)
    assert np.isfinite(np.asarray(sol.X)).all()
    assert np.isfinite(float(sol.stats.cost))
    # states stay physically plausible in scale (no runaway step)
    assert float(jnp.max(jnp.abs(sol.X))) < 1e3
