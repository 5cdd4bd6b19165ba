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


def test_riccati_terminal_in_kernel_matches_xla_terminal():
    """riccati_pallas_lane_major(terminal=...) builds (P_N, p_N) inside the
    kernel from a q-only dual FK pass; must match the precomputed-P_N path
    fed by sqp._linearize_terminal (the XLA jacfwd oracle)."""
    import numpy as _np

    from __graft_entry__ import _flagship
    from iterative_learning_nmpc_tpu.ops.dynjac_kernel import _make_consts
    from iterative_learning_nmpc_tpu.ops.riccati_kernel import (
        riccati_pallas_lane_major)
    from iterative_learning_nmpc_tpu.solver.sqp import NX, _linearize_terminal

    solver, X, U, params = _flagship()
    w = solver.weights
    rng = np.random.RandomState(5)
    B, N = 2, 4
    Bp = 128

    # lane-major random GN blocks (well-conditioned)
    def lane(r, c, scale=1.0):
        x = scale * rng.randn(N, r, c, Bp).astype(np.float32)
        return jnp.asarray(x)

    eye36 = np.eye(36, dtype=np.float32)[None, :, :, None]
    eye32 = np.eye(32, dtype=np.float32)[None, :, :, None]
    Qt = lane(36, 36, 0.05) + jnp.asarray(10.0 * eye36)
    Rt = lane(32, 32, 0.05) + jnp.asarray(10.0 * eye32)
    MTt = lane(32, 36, 0.02)
    qxt, rut = lane(36, 1), lane(32, 1)
    d = 0.01 * rng.randn(B, N, 36).astype(np.float32)

    # perturbed terminal states around the flagship stance
    xN = np.tile(np.asarray(X[-1])[None], (B, 1)).astype(np.float32)
    xN += 0.05 * rng.randn(B, 36).astype(np.float32)
    xref_e = np.concatenate(
        [np.asarray(params.base_ref_e[:6]), np.asarray(params.joint_ref),
         np.asarray(params.base_ref_e[6:]), np.zeros(12, np.float32)])
    xref_e = np.tile(xref_e[None], (B, 1)).astype(np.float32)
    peak_N = np.tile(np.asarray(params.peak[:, -1])[None], (B, 1))
    peak_N = peak_N.astype(np.float32)
    step_h = np.full((B,), float(params.step_height), np.float32)

    # oracle P_N/p_N via the XLA terminal linearization
    reg_e = float(solver.cost.reg_eps_e)
    def pn_one(x):
        rT, JT = _linearize_terminal(solver.spec, w, x, params)
        return JT.T @ JT + reg_e * jnp.eye(NX, dtype=jnp.float32), JT.T @ rT
    P_N, p_N = jax.vmap(pn_one)(jnp.asarray(xN))

    K0, k0 = riccati_pallas_lane_major(
        0.04, 1e-6, Qt, Rt, MTt, qxt, rut, jnp.asarray(d), P_N, p_N,
        interpret=True)

    wb_e = _np.asarray(w.base_e, _np.float64)
    wj_e = _np.asarray(w.joint_e, _np.float64)
    wTe = _np.concatenate([wb_e[:6], wj_e[:12], wb_e[6:], wj_e[12:]])
    terminal = (jnp.asarray(xN), jnp.asarray(xref_e), jnp.asarray(peak_N),
                jnp.asarray(step_h), _make_consts(solver.spec), wTe * wTe,
                _np.asarray(w.swing, _np.float64), reg_e)
    K1, k1 = riccati_pallas_lane_major(
        0.04, 1e-6, Qt, Rt, MTt, qxt, rut, jnp.asarray(d),
        terminal=terminal, interpret=True)

    scale = max(1.0, float(jnp.max(jnp.abs(K0))))
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K0),
                               atol=5e-5 * scale)
    kscale = max(1.0, float(jnp.max(jnp.abs(k0))))
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k0),
                               atol=5e-5 * kscale)


def test_riccati_rollout_in_kernel_matches_oracle():
    """riccati_rollout_lane_major (backward sweep + alpha=1 rollout fused in
    one kernel, gains VMEM-resident) vs _riccati_solve_structured +
    _forward_delta_structured."""
    from iterative_learning_nmpc_tpu.ops.riccati_kernel import (
        riccati_rollout_lane_major)
    from iterative_learning_nmpc_tpu.solver.sqp import (
        _forward_delta_structured)

    rng = np.random.RandomState(21)
    B, N, h, lm = 3, 6, 0.04, 1e-6
    Q, R, M, qx, ru, P_N, p_N, d = _random_blocks(rng, B, N)
    dx0 = 0.05 * rng.randn(B, 36).astype(np.float32)

    # pack into the lane-major layout the lingram kernel emits
    Bp, pu = 128, 2
    pad = Bp - B
    blast = lambda x: jnp.moveaxis(
        jnp.concatenate(
            [jnp.asarray(x, jnp.float32),
             jnp.zeros((pad,) + x.shape[1:], jnp.float32)], axis=0), 0, -1)
    Qt = blast(Q)
    Rt = blast(np.pad(R, ((0, 0), (0, 0), (0, pu), (0, pu))))
    MTt = blast(np.pad(np.swapaxes(M, 2, 3), ((0, 0), (0, 0), (0, pu), (0, 0))))
    qxt = blast(qx[..., None])
    rut = blast(np.pad(ru, ((0, 0), (0, 0), (0, pu)))[..., None])

    dX1, dU1 = riccati_rollout_lane_major(
        h, lm, Qt, Rt, MTt, qxt, rut, jnp.asarray(d), jnp.asarray(dx0),
        jnp.asarray(P_N), jnp.asarray(p_N), interpret=True)

    K0, k0 = jax.vmap(
        lambda *a: _riccati_solve_structured(h, *a, np.float32(lm))
    )(*map(jnp.asarray, (Q, R, M, qx, ru, P_N, p_N, d)))
    dX0, dU0 = jax.vmap(
        lambda Kb, kb, db, x0: _forward_delta_structured(
            h, Kb, kb, db, x0, np.float32(1.0))
    )(K0, k0, jnp.asarray(d), jnp.asarray(dx0))

    sx = max(1.0, float(jnp.max(jnp.abs(dX0))))
    su = max(1.0, float(jnp.max(jnp.abs(dU0))))
    np.testing.assert_allclose(np.asarray(dX1), np.asarray(dX0),
                               atol=3e-4 * sx)
    np.testing.assert_allclose(np.asarray(dU1), np.asarray(dU0),
                               atol=3e-4 * su)
