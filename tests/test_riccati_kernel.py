"""Fused Pallas Riccati sweep vs the sequential structured oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.ops.riccati_kernel import (
    make_riccati_pallas,
    riccati_pallas_batched,
)
from iterative_learning_nmpc_tpu.solver.sqp import _riccati_solve_structured


def _random_blocks(rng, B, N, nx=36, nu=30):
    mk = lambda *s: rng.randn(*s).astype(np.float32)
    Jq = mk(B, N, 50, nx)
    Jr = mk(B, N, 50, nu)
    Q = np.einsum("bnri,bnrj->bnij", Jq, Jq) + 1e-3 * np.eye(nx, dtype=np.float32)
    R = np.einsum("bnri,bnrj->bnij", Jr, Jr) + 1.0 * np.eye(nu, dtype=np.float32)
    M = 0.1 * np.einsum("bnri,bnrj->bnij", Jq, Jr)
    qx, ru = mk(B, N, nx), mk(B, N, nu)
    PT = mk(B, 60, nx)
    P_N = np.einsum("bri,brj->bij", PT, PT) + np.eye(nx, dtype=np.float32)
    p_N = mk(B, nx)
    d = 0.01 * mk(B, N, nx)
    return Q, R, M, qx, ru, P_N, p_N, d


@pytest.mark.parametrize("B", [4])
@pytest.mark.parametrize("unrolled", [True, False])
def test_riccati_kernel_matches_oracle(B, unrolled):
    rng = np.random.RandomState(11)
    N, h, lm = 7, 0.04, 1e-6
    Q, R, M, qx, ru, P_N, p_N, d = _random_blocks(rng, B, N)

    K1, k1 = riccati_pallas_batched(
        h, lm, *map(jnp.asarray, (Q, R, M, qx, ru, P_N, p_N, d)),
        interpret=True, unrolled=unrolled)

    K0, k0 = jax.vmap(
        lambda *a: _riccati_solve_structured(h, *a, np.float32(lm))
    )(*map(jnp.asarray, (Q, R, M, qx, ru, P_N, p_N, d)))

    scale = float(jnp.max(jnp.abs(K0)))
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K0),
                               atol=2e-4 * scale)
    kscale = max(1.0, float(jnp.max(jnp.abs(k0))))
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k0),
                               atol=2e-4 * kscale)


def test_riccati_custom_vmap_paths():
    """Unbatched call -> sequential scan; vmapped call -> kernel path."""
    rng = np.random.RandomState(3)
    N, h, lm = 5, 0.04, 1e-6
    Q, R, M, qx, ru, P_N, p_N, d = _random_blocks(rng, 3, N)
    fn = make_riccati_pallas(h, lm, interpret=True)

    K_single, k_single = jax.jit(fn)(
        *map(jnp.asarray, (Q[0], R[0], M[0], qx[0], ru[0], P_N[0], p_N[0], d[0])))
    K_batched, k_batched = jax.jit(jax.vmap(fn))(
        *map(jnp.asarray, (Q, R, M, qx, ru, P_N, p_N, d)))
    scale = float(jnp.max(jnp.abs(K_single)))
    np.testing.assert_allclose(np.asarray(K_batched[0]),
                               np.asarray(K_single), atol=2e-4 * scale)


def test_forward_rollout_kernel_matches_oracle():
    """forward_rollout_lane_major (alpha=1 affine rollout consuming the
    Riccati kernel's lane-major K/kff) vs sqp._forward_delta_structured."""
    from iterative_learning_nmpc_tpu.ops.riccati_kernel import (
        forward_rollout_lane_major)
    from iterative_learning_nmpc_tpu.solver.sqp import (
        _forward_delta_structured)

    rng = np.random.RandomState(7)
    B, N, h = 3, 6, 0.04
    K = 0.3 * rng.randn(B, N, 30, 36).astype(np.float32)
    kff = rng.randn(B, N, 30).astype(np.float32)
    d = 0.05 * rng.randn(B, N, 36).astype(np.float32)
    dx0 = 0.1 * rng.randn(B, 36).astype(np.float32)

    # pack K/kff/defects into the Riccati kernel's lane-major layout
    Bp = 128
    pad = Bp - B
    blast = lambda x: jnp.moveaxis(
        jnp.concatenate(
            [jnp.asarray(x),
             jnp.zeros((pad,) + x.shape[1:], np.float32)], axis=0), 0, -1)
    Kt = blast(K)                                   # (N, 30, 36, Bp)
    kfft = blast(kff[..., None])                    # (N, 30, 1, Bp)
    drt = blast(d[:, :, None, :])                   # (N, 1, 36, Bp)

    dX1, dU1 = forward_rollout_lane_major(
        h, Kt, kfft, drt, jnp.asarray(dx0), interpret=True)

    dX0, dU0 = jax.vmap(
        lambda Kb, kb, db, x0: _forward_delta_structured(
            h, Kb, kb, db, x0, np.float32(1.0))
    )(*map(jnp.asarray, (K, kff, d, dx0)))

    sx = max(1.0, float(jnp.max(jnp.abs(dX0))))
    np.testing.assert_allclose(np.asarray(dX1), np.asarray(dX0),
                               atol=2e-5 * sx)
    su = max(1.0, float(jnp.max(jnp.abs(dU0))))
    np.testing.assert_allclose(np.asarray(dU1), np.asarray(dU0),
                               atol=2e-5 * su)
