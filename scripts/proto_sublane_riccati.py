"""Prototype: batch-in-SUBLANES node solve vs the production batch-in-lanes
layout (VERDICT r4 item 3 — settle the last perf lever empirically).

The production riccati kernel lays every matrix out as (rows-untiled,
cols-on-sublanes, 128-problems-on-lanes): masking over the 30/36-dim
column axis costs in-vreg waste (triangular updates process the full
matrix; ~3.6x derived Cholesky waste in docs/ROOFLINE.md). The candidate
re-layout puts BOTH matrix dims on untiled leading axes and fills the
vreg with batch: (rows, cols, 8-problems-on-sublanes,
128-problems-on-lanes). Every (row, col) element is then a dense (8, 128)
vreg of problems, triangular updates become STATIC slices (the node loop
is unrolled), and no masking exists at all.

Both kernels compute the same per-node factorize-and-solve
(Cholesky(Quu) -> W = L^-1 [Qux | qu] -> Z = L^-T W -> Gram W^T W) on the
same random inputs; outputs are cross-checked, then timed over a
(batch-tiles x nodes) grid.

    python scripts/proto_sublane_riccati.py [--b 1024] [--n 25]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iterative_learning_nmpc_tpu.ops.riccati_kernel import (
    LB,
    NUK,
    NUP,
    NXK,
    _solve_node_unrolled,
)

SB = 8            # problems per vreg sublane dim (f32 native tile height)


# --------------------------------------------------------------------------
# kernel A: production layout (rows, cols-on-sublanes, LB-on-lanes)
def _kernel_lanes(Qxx_ref, Quu_ref, Qux_ref, qxp_ref, qu_ref,
                  K_ref, kff_ref, P_ref, p_ref):
    K, kff, P, p = _solve_node_unrolled(
        Qxx_ref[0], Quu_ref[0], Qux_ref[0], qxp_ref[0], qu_ref[0])
    K_ref[0] = K
    kff_ref[0] = kff
    P_ref[0] = P
    p_ref[0] = p


def run_lanes(Qxx, Quu, Qux, qxp, qu):
    """Inputs batch-major (B, N, ...); layout/blast as the production
    kernel does."""
    B, N = Qxx.shape[:2]
    bl = lambda x: jnp.moveaxis(x, 0, -1)     # (N, d1, d2, B)
    node = lambda i, j: (j, 0, 0, i)
    f32 = jnp.float32
    mk = lambda d1, d2: pl.BlockSpec((1, d1, d2, LB), node,
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_lanes,
        out_shape=[
            jax.ShapeDtypeStruct((N, NUP, NXK, B), f32),
            jax.ShapeDtypeStruct((N, NUP, 1, B), f32),
            jax.ShapeDtypeStruct((N, NXK, NXK, B), f32),
            jax.ShapeDtypeStruct((N, NXK, 1, B), f32),
        ],
        grid=(B // LB, N),
        in_specs=[mk(NXK, NXK), mk(NUP, NUP), mk(NUP, NXK),
                  mk(NXK, 1), mk(NUP, 1)],
        out_specs=[mk(NUP, NXK), mk(NUP, 1), mk(NXK, NXK), mk(NXK, 1)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(bl(Qxx), bl(Quu), bl(Qux), bl(qxp), bl(qu))


# --------------------------------------------------------------------------
# kernel B: sublane-batch layout (rows, cols, SB, LB) — no masks, static
# triangular slices, unrolled node loop
def _solve_node_sublane(Qxx, Quu, Qux, qxp, qu):
    """Same math as _solve_node_unrolled on (d1, d2, SB, LB) values.
    Quu (NUK, NUK), Qux (NUK, NXK), qu (NUK, 1), Qxx (NXK, NXK),
    qxp (NXK, 1) — true dims, no padding (rows/cols are untiled)."""
    eps = 1e-30
    A = Quu
    lrows = []                     # lrows[k]: (NUK-k, SB, LB) = L[k:, k]
    rss = []
    for k in range(NUK):
        rs = jax.lax.rsqrt(jnp.maximum(A[k, k], eps))     # (SB, LB)
        lrow = A[k, k:] * rs                               # row seg incl diag
        lrows.append(lrow)
        rss.append(rs)
        if k + 1 < NUK:
            lcol = A[k + 1:, k] * rs                       # (NUK-k-1, SB, LB)
            A = A.at[k + 1:, k + 1:].add(
                -lcol[:, None] * lrow[None, 1:])

    RHS = jnp.concatenate([Qux, qu], axis=1)               # (NUK, NXK+1,...)
    ys = []
    for k in range(NUK):
        acc = RHS[k]                                       # (NXK+1, SB, LB)
        for jj in range(k):
            acc = acc - lrows[jj][k - jj] * ys[jj]         # L[k, jj] scalar-vreg
        ys.append(acc * rss[k])

    zs = [None] * NUK
    for k in reversed(range(NUK)):
        acc = ys[k]
        for jj in range(k + 1, NUK):
            acc = acc - lrows[k][jj - k] * zs[jj]          # L[jj, k]
        zs[k] = acc * rss[k]
    Z = jnp.stack(zs, axis=0)                              # (NUK, NXK+1,...)

    C = None
    for k in range(NUK):
        yk = ys[k]                                         # (NXK+1, SB, LB)
        term = yk[:NXK, None] * yk[None, :]                # (NXK, NXK+1,...)
        C = term if C is None else C + term

    return (-Z[:, :NXK], -Z[:, NXK:],
            Qxx - C[:, :NXK], qxp - C[:, NXK:])


def _kernel_sublane(Qxx_ref, Quu_ref, Qux_ref, qxp_ref, qu_ref,
                    K_ref, kff_ref, P_ref, p_ref):
    K, kff, P, p = _solve_node_sublane(
        Qxx_ref[0], Quu_ref[0], Qux_ref[0], qxp_ref[0], qu_ref[0])
    K_ref[0] = K
    kff_ref[0] = kff
    P_ref[0] = P
    p_ref[0] = p


def run_sublane(Qxx, Quu, Qux, qxp, qu):
    """Inputs batch-major (B, N, d1, d2) with TRUE dims (no u padding);
    re-laid to (N, d1, d2, SB, LB)."""
    B, N = Qxx.shape[:2]
    TB = SB * LB

    def bl(x):
        d1, d2 = x.shape[2], x.shape[3]
        # (B, N, d1, d2) -> (nb, SB, LB, N, d1, d2) -> (N, d1, d2, nb*SB? ...)
        x = x.reshape(B // TB, SB, LB, N, d1, d2)
        return jnp.transpose(x, (3, 4, 5, 0, 1, 2)).reshape(
            N, d1, d2, (B // TB) * SB, LB)

    # block index: batch tile i covers sublane-group slice [i*SB, (i+1)*SB)
    node = lambda i, j: (j, 0, 0, i, 0)
    f32 = jnp.float32
    mk = lambda d1, d2: pl.BlockSpec((1, d1, d2, SB, LB), node,
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_sublane,
        out_shape=[
            jax.ShapeDtypeStruct((N, NUK, NXK, (B // TB) * SB, LB), f32),
            jax.ShapeDtypeStruct((N, NUK, 1, (B // TB) * SB, LB), f32),
            jax.ShapeDtypeStruct((N, NXK, NXK, (B // TB) * SB, LB), f32),
            jax.ShapeDtypeStruct((N, NXK, 1, (B // TB) * SB, LB), f32),
        ],
        grid=(B // TB, N),
        in_specs=[mk(NXK, NXK), mk(NUK, NUK), mk(NUK, NXK),
                  mk(NXK, 1), mk(NUK, 1)],
        out_specs=[mk(NUK, NXK), mk(NUK, 1), mk(NXK, NXK), mk(NXK, 1)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(bl(Qxx), bl(Quu), bl(Qux), bl(qxp), bl(qu))


# --------------------------------------------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()
    B, N = args.b, args.n

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    rng = np.random.default_rng(0)
    f32 = np.float32
    G = rng.normal(0, 0.3, (B, N, NUK, NUK)).astype(f32)
    Quu = (G @ np.swapaxes(G, 2, 3) + 3.0 * np.eye(NUK, dtype=f32)).astype(f32)
    Qux = rng.normal(0, 0.5, (B, N, NUK, NXK)).astype(f32)
    Qxx = rng.normal(0, 0.5, (B, N, NXK, NXK)).astype(f32)
    qxp = rng.normal(0, 0.5, (B, N, NXK, 1)).astype(f32)
    qu = rng.normal(0, 0.5, (B, N, NUK, 1)).astype(f32)

    # padded copies for the production-layout kernel (u padded to NUP with
    # identity diag, exactly as riccati_pallas_batched prepares them)
    pu = NUP - NUK
    Quu_p = np.pad(Quu, ((0, 0), (0, 0), (0, pu), (0, pu)))
    Quu_p[:, :, NUK:, NUK:] += np.eye(pu, dtype=f32)
    Qux_p = np.pad(Qux, ((0, 0), (0, 0), (0, pu), (0, 0)))
    qu_p = np.pad(qu, ((0, 0), (0, 0), (0, pu), (0, 0)))

    fA = jax.jit(run_lanes)
    fB = jax.jit(run_sublane)

    outA = jax.block_until_ready(fA(
        jnp.asarray(Qxx), jnp.asarray(Quu_p), jnp.asarray(Qux_p),
        jnp.asarray(qxp), jnp.asarray(qu_p)))
    outB = jax.block_until_ready(fB(
        jnp.asarray(Qxx), jnp.asarray(Quu), jnp.asarray(Qux),
        jnp.asarray(qxp), jnp.asarray(qu)))

    # cross-check: un-lay both to batch-major and compare K
    KA = np.moveaxis(np.asarray(outA[0]), -1, 0)[:, :, :NUK]  # (B,N,30,36)?
    # outA[0] is (N, NUP, NXK, B) -> (B, N, NUP, NXK)
    KA = np.transpose(np.asarray(outA[0]), (3, 0, 1, 2))[:, :, :NUK]
    KBt = np.asarray(outB[0])                      # (N, 30, 36, nb*SB, LB)
    nb = B // (SB * LB)
    KB = KBt.reshape(N, NUK, NXK, nb, SB, LB)
    KB = np.transpose(KB, (3, 4, 5, 0, 1, 2)).reshape(B, N, NUK, NXK)
    dk = np.max(np.abs(KA - KB)) / max(np.max(np.abs(KA)), 1e-9)
    print(f"cross-check rel max|dK| = {dk:.2e}")

    from _timing import timeit as _t  # noqa: F401  (fence helper exists)

    def timeit(fn, *xs):
        jax.block_until_ready(fn(*xs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            jax.block_until_ready(fn(*xs))
        return (time.perf_counter() - t0) / args.reps * 1e3

    argsA = tuple(jnp.asarray(x) for x in (Qxx, Quu_p, Qux_p, qxp, qu_p))
    argsB = tuple(jnp.asarray(x) for x in (Qxx, Quu, Qux, qxp, qu))
    tA = timeit(fA, *argsA)
    tB = timeit(fB, *argsB)
    print(f"B={B} N={N} reps={args.reps}")
    print(f"lanes   (production layout): {tA:.3f} ms  "
          f"({B * N / tA * 1e3 / 1e6:.1f}M node-solves/s)")
    print(f"sublane (candidate layout):  {tB:.3f} ms  "
          f"({B * N / tB * 1e3 / 1e6:.1f}M node-solves/s)")
    print(f"speedup: {tA / tB:.2f}x")


if __name__ == "__main__":
    main()
