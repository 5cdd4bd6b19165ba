"""Fused dynamics+Jacobian Pallas kernel vs the jacfwd oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.ops.dynjac_kernel import dynjac_pallas
from iterative_learning_nmpc_tpu.robots.go2 import go2_spec


def _oracle(spec, X, A, Fe):
    """jacfwd of [p_feet, v_feet, tau] wrt (x, a) with f fixed."""
    def core(x, a, fe):
        def f(xa):
            q, v = xa[:18], xa[18:36]
            p = dyn.foot_positions(spec, q).reshape(-1)
            vf = dyn.foot_velocities(spec, q, v).reshape(-1)
            tau = dyn.rnea(spec, q, v, xa[36:], f_ext_feet=fe.reshape(4, 3))
            return jnp.concatenate([p, vf, tau])
        za = jnp.concatenate([x, a])
        return f(za), jax.jacfwd(f)(za)
    return jax.vmap(core)(X, A, Fe)


def test_dynjac_kernel_matches_jacfwd():
    spec = go2_spec()
    rng = np.random.RandomState(5)
    M = 9
    q0 = np.asarray(spec.q_home, np.float32)
    X = np.tile(np.concatenate([q0, np.zeros(18, np.float32)])[None], (M, 1))
    X += 0.2 * rng.randn(M, 36).astype(np.float32)
    A = (2.0 * rng.randn(M, 18)).astype(np.float32)
    Fe = (20.0 * rng.randn(M, 12)).astype(np.float32)

    prim1, J1 = dynjac_pallas(spec, jnp.asarray(X), jnp.asarray(A),
                              jnp.asarray(Fe), interpret=True)
    prim0, J0 = _oracle(spec, jnp.asarray(X), jnp.asarray(A), jnp.asarray(Fe))

    np.testing.assert_allclose(np.asarray(prim1), np.asarray(prim0),
                               rtol=1e-4, atol=1e-3)
    scale = float(jnp.max(jnp.abs(J0)))
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J0),
                               atol=3e-5 * scale)


def test_linearize_stages_dynjac_matches_oracle():
    """Full kernel-path linearization (r, Jx, Ju) vs the jacfwd oracle,
    including the duality block d(tau)/d(f) = -(d v_foot/d v)^T."""
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.solver import sqp as S
    from iterative_learning_nmpc_tpu.solver.linearize import (
        linearize_stages_dynjac,
        make_const_blocks,
    )

    gait, opt, cost = get_quadruped_config("trot", "go2")
    spec = go2_spec()
    solver = S.TrajOptSolver(spec, opt, cost)
    rng = np.random.RandomState(3)
    B, N = 3, solver.N
    q0 = np.asarray(spec.q_home, np.float32)
    X = np.tile(np.concatenate([q0, np.zeros(18, np.float32)])[None, None],
                (B, N + 1, 1))
    X += 0.05 * rng.randn(B, N + 1, 36).astype(np.float32)
    U = 0.3 * rng.randn(B, N, 30).astype(np.float32)
    U[:, :, 20::3] += 30.0

    def mk_params(b):
        cnt = (rng.rand(4, N + 1) > 0.4).astype(np.float32)
        return S.make_params(
            solver, X[b, 0], cnt,
            cnt_loc=0.3 * rng.randn(4, N + 1, 3).astype(np.float32),
            patch_radius=np.full((4, N + 1), 0.05, np.float32),
            restrict=1.0,
            lam_eq=0.1 * rng.randn(N, 18).astype(np.float32),
            lam_ineq=0.5 * np.abs(rng.randn(N, 36)).astype(np.float32),
        )

    plist = [mk_params(b) for b in range(B)]
    pb = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                      *plist)
    Xb, Ub = jnp.asarray(X), jnp.asarray(U)

    w = solver.weights
    Jxc, Juc = make_const_blocks(w)
    r1, Jx1, Ju1 = linearize_stages_dynjac(
        spec, w, Xb, Ub, pb, Jxc, Juc, include_torque=True, interpret=True)

    r0, Jx0, Ju0 = jax.vmap(
        lambda X_, U_, p_: S._linearize_stages(spec, w, X_, U_, p_,
                                               include_torque=True)
    )(Xb, Ub, pb)

    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               rtol=1e-4, atol=1e-3)
    for name, a1, a0 in (("Jx", Jx1, Jx0), ("Ju", Ju1, Ju0)):
        scale = float(jnp.max(jnp.abs(a0)))
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   atol=1e-4 * scale, err_msg=name)


def test_total_cost_dyncore_matches_oracle():
    """Fused primal-kernel merit (2 leading dims: alphas x batch) vs the
    XLA residual-stack cost."""
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.solver import sqp as S
    from iterative_learning_nmpc_tpu.solver.linearize import total_cost_dyncore

    gait, opt, cost = get_quadruped_config("trot", "go2")
    spec = go2_spec()
    solver = S.TrajOptSolver(spec, opt, cost)
    rng = np.random.RandomState(11)
    A_, B_, N = 2, 3, solver.N
    q0 = np.asarray(spec.q_home, np.float32)
    X = np.tile(np.concatenate([q0, np.zeros(18, np.float32)])[None, None, None],
                (A_, B_, N + 1, 1))
    X += 0.05 * rng.randn(A_, B_, N + 1, 36).astype(np.float32)
    U = 0.3 * rng.randn(A_, B_, N, 30).astype(np.float32)
    U[..., 20::3] += 30.0

    def mk_params(b):
        cnt = (rng.rand(4, N + 1) > 0.4).astype(np.float32)
        return S.make_params(
            solver, X[0, b, 0], cnt,
            lam_eq=0.1 * rng.randn(N, 18).astype(np.float32),
            lam_ineq=0.5 * np.abs(rng.randn(N, 36)).astype(np.float32),
        )

    plist = [mk_params(b) for b in range(B_)]
    pb = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                      *plist)
    pab = jax.tree.map(lambda x: jnp.broadcast_to(x[None],
                                                  (A_,) + x.shape), pb)
    Xb, Ub = jnp.asarray(X), jnp.asarray(U)

    c1 = total_cost_dyncore(spec, solver.weights, Xb, Ub, pab,
                            interpret=True)
    c0 = jax.vmap(jax.vmap(solver._total_cost_xla))(Xb, Ub, pab)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=2e-5)
    assert c1.shape == (A_, B_)


def test_lingram_stages_dynjac_matches_oracle():
    """Fused linearize+Gram condensation vs explicit J^T J on the oracle
    linearization."""
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.solver import sqp as S
    from iterative_learning_nmpc_tpu.solver.linearize import (
        lingram_stages_dynjac,
        make_const_blocks,
    )

    gait, opt, cost = get_quadruped_config("trot", "go2")
    spec = go2_spec()
    solver = S.TrajOptSolver(spec, opt, cost)
    rng = np.random.RandomState(7)
    B, N = 2, solver.N
    q0 = np.asarray(spec.q_home, np.float32)
    X = np.tile(np.concatenate([q0, np.zeros(18, np.float32)])[None, None],
                (B, N + 1, 1))
    X += 0.05 * rng.randn(B, N + 1, 36).astype(np.float32)
    U = 0.3 * rng.randn(B, N, 30).astype(np.float32)
    U[:, :, 20::3] += 30.0

    plist = [S.make_params(solver, X[b, 0],
                           (rng.rand(4, N + 1) > 0.4).astype(np.float32))
             for b in range(B)]
    pb = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                      *plist)
    Xb, Ub = jnp.asarray(X), jnp.asarray(U)

    w = solver.weights
    Jxc, Juc = make_const_blocks(w)
    inc = solver.opt.torque_limit_in_qp
    Q1, R1, M1, qx1, ru1 = lingram_stages_dynjac(
        spec, w, Xb, Ub, pb, Jxc, Juc, include_torque=inc, interpret=True)

    r0, Jx0, Ju0 = jax.vmap(
        lambda X_, U_, p_: S._linearize_stages(spec, w, X_, U_, p_,
                                               include_torque=inc)
    )(Xb, Ub, pb)
    Q0 = jnp.einsum("bnri,bnrj->bnij", Jx0, Jx0)
    R0 = jnp.einsum("bnri,bnrj->bnij", Ju0, Ju0)
    M0 = jnp.einsum("bnri,bnrj->bnij", Jx0, Ju0)
    qx0 = jnp.einsum("bnri,bnr->bni", Jx0, r0)
    ru0 = jnp.einsum("bnri,bnr->bni", Ju0, r0)

    for name, a1, a0 in (("Q", Q1, Q0), ("R", R1, R0), ("M", M1, M0),
                         ("qx", qx1, qx0), ("ru", ru1, ru0)):
        scale = max(float(jnp.max(jnp.abs(a0))), 1.0)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   atol=3e-4 * scale, err_msg=name)
