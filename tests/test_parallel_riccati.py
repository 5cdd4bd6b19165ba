"""Associative-scan Riccati vs the sequential oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.solver.parallel_riccati import parallel_riccati
from iterative_learning_nmpc_tpu.solver.sqp import _riccati_solve


def _random_lqr(rng, N=25, nx=8, nu=5, dtype=jnp.float64):
    A = jnp.asarray(np.eye(nx) + 0.05 * rng.normal(size=(nx, nx)), dtype)
    B = jnp.asarray(rng.normal(size=(nx, nu)) * 0.1, dtype)
    # rank-deficient B (our force columns don't enter the dynamics)
    B = B.at[:, -2:].set(0.0)

    def spd(n, scale):
        W = rng.normal(size=(N, n, n))
        return jnp.asarray(
            np.einsum("nij,nkj->nik", W, W) + scale * np.eye(n), dtype
        )

    Q = spd(nx, 1.0)
    R = spd(nu, 0.5)
    M = jnp.asarray(0.1 * rng.normal(size=(N, nx, nu)), dtype)
    qx = jnp.asarray(rng.normal(size=(N, nx)), dtype)
    ru = jnp.asarray(rng.normal(size=(N, nu)), dtype)
    d = jnp.asarray(0.1 * rng.normal(size=(N, nx)), dtype)
    W = rng.normal(size=(nx, nx))
    P_N = jnp.asarray(W @ W.T + np.eye(nx), dtype)
    p_N = jnp.asarray(rng.normal(size=nx), dtype)
    return A, B, Q, R, M, qx, ru, P_N, p_N, d


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_sequential(rng, seed):
    jax.config.update("jax_enable_x64", True)
    try:
        args = _random_lqr(np.random.default_rng(seed))
        lm = jnp.asarray(1e-8, jnp.float64)
        K_seq, k_seq = _riccati_solve(*args, lm)
        K_par, k_par = parallel_riccati(*args, lm)
        np.testing.assert_allclose(np.asarray(K_par), np.asarray(K_seq),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(k_par), np.asarray(k_seq),
                                   rtol=1e-8, atol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fp32_ocp_scale(rng):
    """fp32 agreement at the real OCP dimensions and weight scales."""
    N, nx, nu = 25, 36, 30
    r = np.random.default_rng(3)
    A = jnp.asarray(np.eye(nx) + 0.04 * np.diag(np.ones(nx)), jnp.float32)
    B = jnp.asarray(np.concatenate(
        [0.04 * r.normal(size=(nx, 18)), np.zeros((nx, 12))], axis=1
    ), jnp.float32)

    def spd(n, scales):
        W = r.normal(size=(N, n, n)) * scales
        return jnp.asarray(np.einsum("nij,nkj->nik", W, W) + 1e-2 * np.eye(n),
                           jnp.float32)

    Q = spd(nx, 10.0)
    R = spd(nu, 2.0)
    M = jnp.asarray(r.normal(size=(N, nx, nu)), jnp.float32)
    qx = jnp.asarray(100 * r.normal(size=(N, nx)), jnp.float32)
    ru = jnp.asarray(10 * r.normal(size=(N, nu)), jnp.float32)
    d = jnp.asarray(0.01 * r.normal(size=(N, nx)), jnp.float32)
    W0 = r.normal(size=(nx, nx)) * 10
    P_N = jnp.asarray(W0 @ W0.T + np.eye(nx), jnp.float32)
    p_N = jnp.asarray(r.normal(size=nx), jnp.float32)
    lm = jnp.asarray(1e-6, jnp.float32)

    K_seq, k_seq = _riccati_solve(A, B, Q, R, M, qx, ru, P_N, p_N, d, lm)
    K_par, k_par = parallel_riccati(A, B, Q, R, M, qx, ru, P_N, p_N, d, lm)
    # fp32: the composed (I + CJ)^{-1} solves lose ~3 digits vs the
    # backward-stable sequential sweep at OCP conditioning — the parallel
    # sweep is exact in f64 (test above) and ~1e-2 relative in fp32. This is
    # the documented precision envelope of the long-horizon option.
    denom = np.abs(np.asarray(K_seq)).max()
    assert np.abs(np.asarray(K_par) - np.asarray(K_seq)).max() < 2e-2 * denom
    denom_k = np.abs(np.asarray(k_seq)).max()
    assert np.abs(np.asarray(k_par) - np.asarray(k_seq)).max() < 2e-2 * denom_k


def test_long_horizon_n100_modes_agree(go2):
    """N=100 long-horizon story (VERDICT r2 item 7, correctness leg): the
    sequential and associative sweeps must produce the same RTI step at a
    4x horizon; timing on real hardware lives in
    scripts/bench_long_horizon.py."""
    import copy

    import numpy as np

    from iterative_learning_nmpc_tpu.gait.planner import ContactPlanner
    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params

    N = 100
    gait, opt, cost = get_quadruped_config("trot", "go2")
    opt.n_nodes = N
    opt.time_horizon = N * 0.04
    planner = ContactPlanner(go2.feet_frame_names, 0.04, gait)
    q0 = np.asarray(go2.q_home, np.float32).copy()
    p0 = np.asarray(jax.jit(lambda qq: dyn.foot_positions(go2, qq))(q0))
    q0[2] += -p0[0, 2] + float(np.asarray(go2.foot_radius))
    x0 = np.concatenate([q0, np.zeros(18, np.float32)])
    cnt = planner.get_contacts(0, N + 1).astype(np.float32)
    base_ref = np.zeros(12, np.float32)
    base_ref[:3] = q0[:3]
    base_ref[2] = gait.nom_height
    base_ref[6] = 0.3

    def run(mode, dtype):
        import jax.numpy as jnp

        o = copy.deepcopy(opt)
        o.riccati_mode = mode
        o.linearize_mode = "jacfwd"
        solver = TrajOptSolver(go2, o, cost, dtype=dtype)
        params = make_params(
            solver, x0, cnt, base_ref=base_ref, base_ref_e=base_ref,
            step_height=gait.step_height,
            ground_height=float(np.asarray(go2.foot_radius)))
        X, U = jax.jit(solver.cold_start)(params)
        sol = jax.jit(lambda x, u, p: solver.solve(x, u, p, 2))(X, U, params)
        out = np.asarray(sol.U)
        assert np.isfinite(out).all(), (mode, dtype)
        return out

    import jax.numpy as jnp

    rel = lambda a, b: (np.abs(a - b) / (1.0 + np.abs(b))).max()
    # algorithmic correctness at N=100: in f64 the log-depth composition
    # matches the sequential sweep tightly through 2 full SQP iterations
    jax.config.update("jax_enable_x64", True)
    try:
        r64 = rel(run("associative", jnp.float64),
                  run("sequential", jnp.float64))
    finally:
        jax.config.update("jax_enable_x64", False)
    assert r64 < 1e-6, r64
    # fp32 envelope: conditioning over a 4 s horizon amplifies composition
    # round-off (~1e-1 after 2 iterations incl. line-search bifurcation) —
    # the honest reason parallel_riccati stays opt-in at long horizons on
    # fp32; bound it so silent further regressions fail
    r32 = rel(run("associative", jnp.float32),
              run("sequential", jnp.float32))
    assert r32 < 0.3, r32
