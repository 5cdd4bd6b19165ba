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


def lay_lanes(x):
    return jnp.moveaxis(x, 0, -1)             # (N, d1, d2, B)


def run_lanes(Qxx, Quu, Qux, qxp, qu):
    """Inputs PRE-LAID (N, d1, d2, B) — timing covers the kernel only."""
    N, B = Qxx.shape[0], Qxx.shape[-1]
    bl = lambda x: x
    node = lambda i, j: (j, 0, 0, i)
    f32 = jnp.float32
    mk = lambda d1, d2: pl.BlockSpec((1, d1, d2, LB), node,
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_lanes,
        out_shape=[
            jax.ShapeDtypeStruct((N, NUK, NXK, B), f32),
            jax.ShapeDtypeStruct((N, NUK, 1, B), f32),
            jax.ShapeDtypeStruct((N, NXK, NXK, B), f32),
            jax.ShapeDtypeStruct((N, NXK, 1, B), f32),
        ],
        grid=(B // LB, N),
        in_specs=[mk(NXK, NXK), mk(NUP, NUP), mk(NUP, NXK),
                  mk(NXK, 1), mk(NUP, 1)],
        out_specs=[mk(NUK, NXK), mk(NUK, 1), mk(NXK, NXK), mk(NXK, 1)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(bl(Qxx), bl(Quu), bl(Qux), bl(qxp), bl(qu))


# --------------------------------------------------------------------------
# kernel B: sublane-batch layout (rows, cols, SB, LB) — no masks, static
# triangular slices, unrolled node loop
def _ix(x, i, axis=0):
    """x[i] along `axis` via lax.slice (jnp int indexing lowers through
    gather, which Mosaic only supports in 2D)."""
    return jax.lax.index_in_dim(x, i, axis=axis, keepdims=False)


def _sl(x, lo, hi, axis=0):
    return jax.lax.slice_in_dim(x, lo, hi, axis=axis)


def _solve_node_sublane(Qxx, Quu, Qux, qxp, qu):
    """Same math as _solve_node_unrolled on (d1, d2, SB, LB) values.
    Quu (NUK, NUK), Qux (NUK, NXK), qu (NUK, 1), Qxx (NXK, NXK),
    qxp (NXK, 1) — true dims, no padding (rows/cols are untiled)."""
    eps = 1e-30
    # right-looking Cholesky on the SHRINKING active submatrix: A always
    # holds rows/cols [k:, k:]; every step is a static slice + dense
    # rank-1 update (no scatter/gather — Mosaic rejects 4D .at updates),
    # and by symmetry the pivot row IS the pivot column.
    A = Quu
    lrows = []                     # lrows[k]: (NUK-k, SB, LB) = L[k:, k]
    rss = []
    for k in range(NUK):
        row0 = _ix(A, 0)                                   # (NUK-k, SB, LB)
        rs = jax.lax.rsqrt(jnp.maximum(_ix(row0, 0), eps))  # (SB, LB)
        lrow = row0 * rs
        lrows.append(lrow)
        rss.append(rs)
        if k + 1 < NUK:
            tail = _sl(lrow, 1, None)                      # (NUK-k-1, SB, LB)
            A = (_sl(_sl(A, 1, None, 0), 1, None, 1)
                 - tail[:, None] * tail[None, :])

    RHS = jnp.concatenate([Qux, qu], axis=1)               # (NUK, NXK+1,...)
    ys = []
    for k in range(NUK):
        acc = _ix(RHS, k)                                  # (NXK+1, SB, LB)
        for jj in range(k):
            acc = acc - _ix(lrows[jj], k - jj) * ys[jj]    # L[k, jj]
        ys.append(acc * rss[k])

    zs = [None] * NUK
    for k in reversed(range(NUK)):
        acc = ys[k]
        for jj in range(k + 1, NUK):
            acc = acc - _ix(lrows[k], jj - k) * zs[jj]     # L[jj, k]
        zs[k] = acc * rss[k]
    Z = jnp.stack(zs, axis=0)                              # (NUK, NXK+1,...)

    C = None
    for k in range(NUK):
        yk = ys[k]                                         # (NXK+1, SB, LB)
        term = _sl(yk, 0, NXK)[:, None] * yk[None, :]      # (NXK, NXK+1,...)
        C = term if C is None else C + term

    return (-_sl(Z, 0, NXK, 1), -_sl(Z, NXK, None, 1),
            Qxx - _sl(C, 0, NXK, 1), qxp - _sl(C, NXK, None, 1))


def _kernel_sublane(Qxx_ref, Quu_ref, Qux_ref, qxp_ref, qu_ref,
                    K_ref, kff_ref, P_ref, p_ref):
    K, kff, P, p = _solve_node_sublane(
        Qxx_ref[0], Quu_ref[0], Qux_ref[0], qxp_ref[0], qu_ref[0])
    K_ref[0] = K
    kff_ref[0] = kff
    P_ref[0] = P
    p_ref[0] = p


def lay_sublane(x, TB=SB * LB):
    B, N, d1, d2 = x.shape
    x = x.reshape(B // TB, SB, LB, N, d1, d2)
    return jnp.transpose(x, (3, 4, 5, 0, 1, 2)).reshape(
        N, d1, d2, (B // TB) * SB, LB)


def run_sublane(Qxx, Quu, Qux, qxp, qu):
    """Inputs PRE-LAID (N, d1, d2, nb*SB, LB)."""
    N = Qxx.shape[0]
    B = (Qxx.shape[3] // SB) * SB * LB * 1
    B = Qxx.shape[3] * LB
    bl = lambda x: x
    TB = SB * LB

    # block index: batch tile i covers sublane-group slice [i*SB, (i+1)*SB)
    node = lambda i, j: (j, 0, 0, i, 0)
    f32 = jnp.float32
    mk = lambda d1, d2: pl.BlockSpec((1, d1, d2, SB, LB), node,
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_sublane,
        out_shape=[
            jax.ShapeDtypeStruct((N, NUK, NXK, Qxx.shape[3], LB), f32),
            jax.ShapeDtypeStruct((N, NUK, 1, Qxx.shape[3], LB), f32),
            jax.ShapeDtypeStruct((N, NXK, NXK, Qxx.shape[3], LB), f32),
            jax.ShapeDtypeStruct((N, NXK, 1, Qxx.shape[3], LB), f32),
        ],
        grid=(Qxx.shape[3] // SB, N),
        in_specs=[mk(NXK, NXK), mk(NUK, NUK), mk(NUK, NXK),
                  mk(NXK, 1), mk(NUK, 1)],
        out_specs=[mk(NUK, NXK), mk(NUK, 1), mk(NXK, NXK), mk(NXK, 1)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the (8, 128)-problem tile moves ~23 MB of blocks per grid
            # step (x2 double-buffered) — above the default 16 MB scoped-
            # vmem budget, within the chip's capacity
            vmem_limit_bytes=100 * 1024 * 1024),
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

    layA = jax.jit(lambda *xs: tuple(lay_lanes(x) for x in xs))
    layB = jax.jit(lambda *xs: tuple(lay_sublane(x) for x in xs))
    argsA = jax.block_until_ready(layA(
        jnp.asarray(Qxx), jnp.asarray(Quu_p), jnp.asarray(Qux_p),
        jnp.asarray(qxp), jnp.asarray(qu_p)))
    argsB = jax.block_until_ready(layB(
        jnp.asarray(Qxx), jnp.asarray(Quu), jnp.asarray(Qux),
        jnp.asarray(qxp), jnp.asarray(qu)))
    outA = jax.block_until_ready(fA(*argsA))
    outB = jax.block_until_ready(fB(*argsB))

    # cross-check: un-lay both to batch-major and compare K
    # outA[0] is (N, NUK, NXK, B) -> (B, N, NUK, NXK)
    KA = np.transpose(np.asarray(outA[0]), (3, 0, 1, 2))
    KBt = np.asarray(outB[0])                      # (N, 30, 36, nb*SB, LB)
    nb = B // (SB * LB)
    KB = KBt.reshape(N, NUK, NXK, nb, SB, LB)
    KB = np.transpose(KB, (3, 4, 5, 0, 1, 2)).reshape(B, N, NUK, NXK)
    dk = np.max(np.abs(KA - KB)) / max(np.max(np.abs(KA)), 1e-9)
    print(f"cross-check rel max|dK| = {dk:.2e}")

    from _timing import timeit as fence_timeit

    tA = fence_timeit(fA, *argsA, reps=args.reps)
    tB = fence_timeit(fB, *argsB, reps=args.reps)
    print(f"B={B} N={N} reps={args.reps}")
    print(f"lanes   (production layout): {tA:.3f} ms  "
          f"({B * N / tA * 1e3 / 1e6:.1f}M node-solves/s)")
    print(f"sublane (candidate layout):  {tB:.3f} ms  "
          f"({B * N / tB * 1e3 / 1e6:.1f}M node-solves/s)")
    print(f"speedup: {tA / tB:.2f}x")


if __name__ == "__main__":
    main()
