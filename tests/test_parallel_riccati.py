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
