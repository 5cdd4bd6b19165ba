"""Fused Pallas TPU kernel: the whole Riccati backward sweep in one kernel.

The batched sweep is the QP-solve hot loop (the HPIPM role, SURVEY.md §2.3):
N sequential nodes of small (36/30-dim) factorizations. XLA executes it as
~25 x (batched 30x30 Cholesky + triangular solves + small matmuls) with every
intermediate round-tripping HBM. This kernel runs the ENTIRE sweep with the
value function resident in VMEM.

Layout: batch-in-lanes. Every matrix is (rows, cols, LB): rows on the untiled
leading dim, columns on sublanes, LB=128 problems on lanes. All compute is
VPU-elementwise over the batch; there is no dot_general anywhere (the earlier
Mosaic blockers — batched x batched contractions, dynamic sublane slicing —
are designed out):

- products with the double-integrator A/B (constant, sparse) are column
  masks + `pltpu.roll` by 18 sublanes + scale-adds (see
  sqp._riccati_solve_structured for the math),
- row/column extractions are masked reductions with keepdims=True (never a
  transpose: Cholesky operands are symmetric, so column k == row k),
- Cholesky, forward/back substitution, and the Gram update P <- Qxx - W^T W
  are fori_loops of full-matrix masked rank-1 updates,
- the input-Hessian is padded from 30 to 32 with an identity block so the
  u-space loops stay tile-aligned.

Per grid step (batch-tile i, node j) the kernel consumes one node's GN
blocks (streamed HBM->VMEM by the pipeline) and emits (K, kff); the value
function (P, p) lives in VMEM scratch across the node dimension.

Wired into TrajOptSolver as riccati_mode="pallas" through a
jax.custom_batching.custom_vmap: unbatched solves keep the sequential scan
(better latency at B=1), vmapped solves hit this kernel. Measured (v5e,
B=256, N=25): 2.6x the XLA scan; bit-parity with the oracle to ~4e-6.

MEASURED NEXT ARCHITECTURE (round 5, scripts/proto_sublane_riccati.py):
a batch-in-SUBLANES re-layout — (rows, cols, 8-problems-on-sublanes,
128-on-lanes), each matrix element one dense (8, 128) vreg, triangular
updates as static slices on untiled dims, zero masking — runs the node
factorize-and-solve **1.81x** faster than this kernel's layout
(1.576 vs 2.859 ms, B=1024 N=25, bit-identical outputs). Not yet
integrated because the win sits at the lingram->riccati interface: this
kernel's input layout is what lingram_lane_major emits, and an HBM
relayout between them costs more than the save. The integration path
(re-lay both kernels) and Mosaic pitfalls are in docs/ROOFLINE.md.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NXK = 36          # state dim
NUK = 30          # true input dim
NUP = 32          # padded input dim inside the kernel (tile-aligned)
LB = 128          # batch lanes per program


def fused_rollout_max_n() -> int:
    """Largest horizon the FUSED sweep+rollout kernel compiles at.

    The rollout variant keeps the gains in VMEM scratch across the node
    grid — K_s (N,30,36,LB) + kff_s (N,30,1,LB) = 568 KB/node — plus the
    N-sized defect/output stacks (~52 KB/node) and ~4 MB of double-buffered
    per-node input blocks, so its VMEM footprint grows ~0.62 MB/node.
    Measured boundary on TPU v5e (remote Mosaic, 2026-08): N=94 compiles,
    N=95 fails (the remote compile helper crashes with an unhelpful
    HTTP 500 / exit 1 rather than a clean VMEM-overflow diagnostic) —
    ~62 MB accumulated footprint at the boundary, consistent with a
    64 MiB VMEM capacity minus compiler reserves. Root-caused as VMEM,
    not program size: the constant-VMEM two-kernel chain
    (riccati_pallas_lane_major raw_out + forward_rollout_lane_major),
    with the SAME per-node instruction mix, compiles at N=100+.

    Returns 88 (~93% of the measured boundary) as the dispatch threshold;
    TrajOptSolver's fused path automatically falls back to the two-kernel
    chain above it (K/kff pay one HBM round trip — the right trade at
    long horizons, where they no longer fit on chip by definition).
    """
    return 88


def _f(x):
    return x.astype(jnp.float32)


def _solve_node_unrolled(Qxx, Quu, Qux, qxp, qu):
    """Statically-unrolled factorize-and-solve for one node.

    The fori_loop formulation extracts rows/columns with masked O(n^2)
    reductions and builds every output (L, W, Z, the Gram) with full-matrix
    masked adds — O(n^3) vector work just to WRITE O(n^2) data. With the
    loops unrolled, every index is static: row reads are free vreg
    selections on the untiled leading dim, outputs are list-collect +
    one concatenate, and only the genuinely O(n^3) arithmetic remains.

    Rows >= NUK of the padded u blocks are zero / identity by construction
    (riccati_pallas_batched pads with zeros; the kernel adds an identity on
    the pad diagonal), so all loops run NUK=30 steps, not NUP=32.
    """
    i32 = jnp.int32
    rvu = jax.lax.broadcasted_iota(i32, (NUP, 1, 1), 0)
    cvu = jax.lax.broadcasted_iota(i32, (1, NUP, 1), 1)

    # ---- Cholesky Quu = L L^T, right-looking, columns kept as rows ----
    A = Quu
    lrows = []    # lrows[k] : (1, NUP, L) = L[:, k] laid out as a row
    rss = []      # (1, 1, L) = 1 / L[k, k]
    for k in range(NUK):
        rowk = A[k:k + 1]                               # = col k (symmetry)
        rs = jax.lax.rsqrt(jnp.maximum(rowk[:, k:k + 1], 1e-30))
        lrow = rowk * (rs * _f(cvu >= k))
        lcol = A[:, k:k + 1] * (rs * _f(rvu > k))
        A = A - lcol * lrow
        lrows.append(lrow)
        rss.append(rs)

    # ---- forward substitution (left-looking): W = L^{-1} [Qux | qu] ----
    RHS = jnp.concatenate([Qux, qu], axis=1)            # (NUP, NXK+1, L)
    ys = []
    for k in range(NUK):
        acc = RHS[k:k + 1]
        for jj in range(k):
            acc = acc - lrows[jj][:, k:k + 1] * ys[jj]  # L[k, jj] * y_jj
        ys.append(acc * rss[k])

    # ---- back substitution: Z = L^{-T} W ----
    zs = [None] * NUK
    for k in reversed(range(NUK)):
        acc = ys[k]
        for jj in range(k + 1, NUK):
            acc = acc - lrows[k][:, jj:jj + 1] * zs[jj]  # L[jj, k] * z_jj
        zs[k] = acc * rss[k]
    Z = jnp.concatenate(zs, axis=0)                      # (NUK, NXK+1, L)

    # ---- Gram: P <- Qxx - W^T W (K-free form), p <- qxp - W^T wf ----
    C = None
    for k in range(NUK):
        yk = ys[k]
        ykT = jnp.concatenate(
            [yk[:, i:i + 1] for i in range(NXK)], axis=0)  # (NXK, 1, L)
        term = ykT * yk                                    # (NXK, NXK+1, L)
        C = term if C is None else C + term

    # A static [:, 36:37] tail slice of a (r, 37, L) array crashes Mosaic's
    # LLO lowering (displacement check in lower_to_llo.cc); extract the
    # last (augmented-residual) column with a masked reduce instead.
    cv37 = jax.lax.broadcasted_iota(i32, (1, NXK + 1, 1), 1)
    lastcol = lambda x: jnp.sum(x * _f(cv37 == NXK), axis=1, keepdims=True)
    return (-Z[:, :NXK], -lastcol(Z),
            Qxx - C[:, :NXK], qxp - lastcol(C))


def _terminal_gram_init(term, XN_ref, XREFE_ref, PKN_ref, SH_ref, P_s, p_s):
    """Build the terminal value function (P_N, p_N) in VMEM from the
    terminal state — replaces the XLA jacfwd/J^T J path of
    sqp._linearize_terminal. Terminal residual (ocp/problem.py
    terminal_residual): diagonal base/joint tracking rows + 4 swing rows
    s_i * (p_z_i(q) - step_h); Gram = diag(wTe^2) + reg*I + sum s_i^2 Jz Jz^T
    with Jz from a q-only dual FK pass (ops/dynjac_kernel.fk_feet_dual)."""
    from .dynjac_kernel import D, _padt, fk_feet_dual

    consts, wTe2, swing, reg = term
    f32 = jnp.float32
    i32 = jnp.int32
    L = XN_ref.shape[-1]
    TQ = 24                                            # padded q-tangent rows

    ti = jax.lax.broadcasted_iota(i32, (TQ, 1), 0)
    q = [D(XN_ref[i], (ti == i).astype(f32)) for i in range(18)]
    p_feet = fk_feet_dual(consts, q)

    rvx = jax.lax.broadcasted_iota(i32, (NXK, 1, 1), 0)
    cvx = jax.lax.broadcasted_iota(i32, (1, NXK, 1), 1)
    wcol = sum((rvx == i).astype(f32) * float(wTe2[i]) for i in range(NXK))
    P = (rvx == cvx).astype(f32) * (wcol + float(reg))  # (36, 36, 1) -> bcast
    P = jnp.broadcast_to(P, (NXK, NXK, L))
    pcol = wcol * (XN_ref[...] - XREFE_ref[...])        # (36, 1, L)

    cv24 = jax.lax.broadcasted_iota(i32, (1, TQ, 1), 1)
    for i in range(4):
        pz = p_feet[i][2]
        t = jnp.broadcast_to(_padt(pz.t, TQ), (TQ, L)).astype(f32)
        row = jnp.concatenate(
            [t[None], jnp.zeros((1, NXK - TQ, L), f32)], axis=1)  # (1,36,L)
        # column form: tangent rows moved to the untiled leading dim
        col = sum((rvx == r).astype(f32)
                  * jnp.sum(t[None] * (cv24 == r).astype(f32),
                            axis=1, keepdims=True)
                  for r in range(18))                   # (36, 1, L)
        s = PKN_ref[i] * float(swing[i])                # (1, L)
        ss = (s * s)[:, None, :]                        # (1, 1, L)
        rz = (pz.v - SH_ref[0])[:, None, :]             # (1, 1, L)
        P = P + ss * (col * row)
        pcol = pcol + ss * rz * col
    P_s[...] = P
    p_s[...] = pcol


def _riccati_kernel(h: float, lm: float, N: int, interpret: bool,
                    unrolled: bool, term, rollout: bool, *refs):
    if rollout:
        # gains stay in VMEM scratch; the affine rollout at alpha=1 runs in
        # the last grid step and only (dX, dU) ever reach HBM.
        if term is None:
            (Q_ref, R_ref, MT_ref, qx_ref, ru_ref, dr_ref, PN_ref, pN_ref,
             DRF_ref, DX0_ref, dX_ref, dU_ref, P_s, p_s, K_s, kff_s) = refs
        else:
            (Q_ref, R_ref, MT_ref, qx_ref, ru_ref, dr_ref, XN_ref, XREFE_ref,
             PKN_ref, SH_ref, DRF_ref, DX0_ref, dX_ref, dU_ref, P_s, p_s,
             K_s, kff_s) = refs
        K_ref = kff_ref = None
    elif term is None:
        (Q_ref, R_ref, MT_ref, qx_ref, ru_ref, dr_ref, PN_ref, pN_ref,
         K_ref, kff_ref, P_s, p_s) = refs
    else:
        (Q_ref, R_ref, MT_ref, qx_ref, ru_ref, dr_ref, XN_ref, XREFE_ref,
         PKN_ref, SH_ref, K_ref, kff_ref, P_s, p_s) = refs
    j = pl.program_id(1)
    hh = 0.5 * h * h

    roll = (lambda x, s: jnp.roll(x, s, axis=1)) if interpret else (
        lambda x, s: pltpu.roll(x, s, axis=1))

    @pl.when(j == 0)
    def _():
        if term is None:
            P_s[...] = PN_ref[...]
            p_s[...] = pN_ref[...]
        else:
            _terminal_gram_init(term, XN_ref, XREFE_ref, PKN_ref, SH_ref,
                                P_s, p_s)

    P = P_s[...]                    # (36, 36, L)
    pcol = p_s[...]                 # (36, 1, L)
    Q = Q_ref[0]                    # (36, 36, L)
    R32 = R_ref[0]                  # (32, 32, L), rows/cols >= 30 zero
    MT = MT_ref[0]                  # (32, 36, L): M^T, rows = u (padded)
    qx = qx_ref[0]                  # (36, 1, L)
    ru = ru_ref[0]                  # (32, 1, L), rows >= 30 zero
    dr = dr_ref[0]                  # (1, 36, L)  defect as a row

    i32 = jnp.int32
    rvu = jax.lax.broadcasted_iota(i32, (NUP, 1, 1), 0)    # u row index
    cvu = jax.lax.broadcasted_iota(i32, (1, NUP, 1), 1)    # u col index
    rvx = jax.lax.broadcasted_iota(i32, (NXK, 1, 1), 0)    # x row index
    cvx = jax.lax.broadcasted_iota(i32, (1, NXK, 1), 1)    # x col index

    # ---- structured products with A = [[I, hI],[0, I]], B = [[hh Ia],[h Ia]]
    colq = _f(cvx < 18)
    Pq = P * colq
    Pv = P - Pq
    PA = Pq + roll(h * Pq, 18) + Pv                       # P @ A
    AtPA = jnp.concatenate([PA[:18], h * PA[:18] + PA[18:]], axis=0)
    PBa = hh * Pq + h * roll(Pv, 18)   # cyclic: -18 == +18 on 36 cols
    BtPA = hh * PA[:18] + h * PA[18:]                     # (18, 36, L)
    BtPB = (hh * PBa[:18] + h * PBa[18:])[:, :NUP, :]     # (18, 32, L) cols<18

    Qxx = Q + AtPA
    eye_u = _f(rvu == cvu)                                # (32, 32, 1)
    Quu = (R32
           + eye_u * _f(rvu < NUK) * lm
           + eye_u * _f(rvu >= NUK)
           + jnp.concatenate(
               [BtPB, jnp.zeros((NUP - 18, NUP, LB), jnp.float32)], axis=0))
    Qux = MT + jnp.concatenate(
        [BtPA, jnp.zeros((NUP - 18, NXK, LB), jnp.float32)], axis=0)  # (32,36,L)

    Pd = jnp.sum(P * dr, axis=1, keepdims=True) + pcol    # (36, 1, L)
    qxp = qx + jnp.concatenate([Pd[:18], h * Pd[:18] + Pd[18:]], axis=0)
    qu = ru + jnp.concatenate(
        [hh * Pd[:18] + h * Pd[18:],
         jnp.zeros((NUP - 18, 1, LB), jnp.float32)], axis=0)   # (32, 1, L)

    if unrolled:
        K, kff, P_new, p_new = _solve_node_unrolled(Qxx, Quu, Qux, qxp, qu)
        if not rollout:
            K_ref[0] = K
            kff_ref[0] = kff
            P_s[...] = P_new
            p_s[...] = p_new
            return
        node = N - 1 - j
        K_s[pl.ds(node, 1)] = K[None]
        kff_s[pl.ds(node, 1)] = kff[None]
        P_s[...] = P_new
        p_s[...] = p_new

        @pl.when(j == N - 1)
        def _():
            # affine rollout at alpha=1 over the VMEM-resident gains
            # (math mirrors _forward_kernel / sqp._forward_delta_structured)
            cv = jax.lax.broadcasted_iota(i32, (1, NXK, 1), 1)
            maskq = _f(cv < 18)
            dx = DX0_ref[...]                       # (1, 36, L)
            for n in range(N):
                Kn = K_s[n]                         # (30, 36, L)
                kffn = kff_s[n]                     # (30, 1, L)
                d = DRF_ref[n]                      # (1, 36, L)
                du = jnp.sum(Kn * dx, axis=1, keepdims=True) + kffn
                du36 = sum(du[r:r + 1] * _f((cv == r) | (cv == r + 18))
                           for r in range(18))
                dX_ref[n] = dx
                dU_ref[n] = du
                dx = (dx + h * (roll(dx, 18) * maskq)
                      + du36 * (hh * maskq + h * (1.0 - maskq)) + d)
            dX_ref[N] = dx
        return

    # ---- masked Cholesky: Quu = L L^T (symmetric rank-1 right-looking) ----
    def chol_step(k, carry):
        A, Lm, LT, rsd = carry
        ck = jnp.sum(A * _f(cvu == k), axis=1, keepdims=True)     # (32,1,L)
        pivot = jnp.sum(ck * _f(rvu == k), axis=0, keepdims=True)  # (1,1,L)
        rs = jax.lax.rsqrt(jnp.maximum(pivot, 1e-30))
        ck_row = jnp.sum(A * _f(rvu == k), axis=0, keepdims=True)  # (1,32,L)
        lk_col = ck * _f(rvu >= k) * rs
        lk_row = ck_row * _f(cvu >= k) * rs
        Lm = Lm + lk_col * _f(cvu == k)
        LT = LT + _f(rvu == k) * lk_row
        rsd = rsd + _f(rvu == k) * rs
        A = A - (lk_col * _f(rvu > k)) * (lk_row * _f(cvu > k))
        return A, Lm, LT, rsd

    zuu = jnp.zeros_like(Quu)
    zu1 = jnp.zeros_like(qu)
    _, Lm, LT, rsd = jax.lax.fori_loop(
        0, NUP, chol_step, (Quu, zuu, zuu, zu1))

    # ---- forward substitution: W = L^{-1} Qux, wf = L^{-1} qu ----
    zux = jnp.zeros_like(Qux)

    def fwd_step(k, carry):
        RX, RF, WX, WF = carry
        rowm = _f(rvu == k)
        rs_k = jnp.sum(rsd * rowm, axis=0, keepdims=True)           # (1,1,L)
        ykx = jnp.sum(RX * rowm, axis=0, keepdims=True) * rs_k      # (1,36,L)
        ykf = jnp.sum(RF * rowm, axis=0, keepdims=True) * rs_k      # (1,1,L)
        WX = WX + rowm * ykx
        WF = WF + rowm * ykf
        lcol = jnp.sum(Lm * _f(cvu == k), axis=1, keepdims=True) * _f(rvu > k)
        RX = RX - lcol * ykx
        RF = RF - lcol * ykf
        return RX, RF, WX, WF

    _, _, WX, WF = jax.lax.fori_loop(
        0, NUP, fwd_step, (Qux, qu, zux, zu1))

    # ---- back substitution: Z = L^{-T} W (outputs only) ----
    def back_step(t, carry):
        RX, RF, ZX, ZF = carry
        k = NUP - 1 - t
        rowm = _f(rvu == k)
        rs_k = jnp.sum(rsd * rowm, axis=0, keepdims=True)
        xkx = jnp.sum(RX * rowm, axis=0, keepdims=True) * rs_k
        xkf = jnp.sum(RF * rowm, axis=0, keepdims=True) * rs_k
        ZX = ZX + rowm * xkx
        ZF = ZF + rowm * xkf
        ltcol = jnp.sum(LT * _f(cvu == k), axis=1, keepdims=True) * _f(rvu < k)
        RX = RX - ltcol * xkx
        RF = RF - ltcol * xkf
        return RX, RF, ZX, ZF

    _, _, ZX, ZF = jax.lax.fori_loop(
        0, NUP, back_step, (WX, WF, zux, zu1))

    K_ref[0] = -ZX[:NUK]
    kff_ref[0] = -ZF[:NUK]

    # ---- value-function update: P <- Qxx - W^T W, p <- qxp - W^T wf ----
    # (K-free form: Qux^T K = -(L^{-1}Qux)^T (L^{-1}Qux) = -W^T W)
    def gram_step(jx, carry):
        C, pc = carry
        wj = jnp.sum(WX * _f(cvx == jx), axis=1, keepdims=True)     # (32,1,L)
        rowj = jnp.sum(WX * wj, axis=0, keepdims=True)              # (1,36,L)
        C = C + _f(rvx == jx) * rowj
        val = jnp.sum(wj * WF, axis=0, keepdims=True)               # (1,1,L)
        pc = pc + _f(rvx == jx) * val
        return C, pc

    zxx = jnp.zeros_like(P)
    zx1 = jnp.zeros_like(pcol)
    C, pcorr = jax.lax.fori_loop(0, NXK, gram_step, (zxx, zx1))
    P_s[...] = Qxx - C
    p_s[...] = qxp - pcorr


def riccati_pallas_batched(h: float, lm: float, Q, R, M, qx_vec, ru_vec,
                           P_N, p_N, defects, *, interpret: bool = False,
                           unrolled: bool = True
                           ) -> Tuple[jax.Array, jax.Array]:
    """Batched fused sweep. Shapes (batch-first, true dims):
    Q (B,N,36,36), R (B,N,30,30), M (B,N,36,30), qx (B,N,36), ru (B,N,30),
    P_N (B,36,36), p_N (B,36), defects (B,N,36) -> K (B,N,30,36), kff (B,N,30).
    """
    B, N = Q.shape[0], Q.shape[1]
    Bp = -(-B // LB) * LB
    pad = Bp - B
    pu = NUP - NUK

    def blast(x):
        # pad trailing batch, move batch to the last axis
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        return jnp.moveaxis(x, 0, -1)

    f32 = jnp.float32
    Qt = blast(Q.astype(f32))                                     # (N,36,36,Bp)
    Rt = blast(jnp.pad(R.astype(f32), ((0, 0), (0, 0), (0, pu), (0, pu))))
    Mt = blast(jnp.pad(jnp.swapaxes(M.astype(f32), 2, 3),
                       ((0, 0), (0, 0), (0, pu), (0, 0))))        # (N,32,36,Bp)
    qxt = blast(qx_vec.astype(f32)[..., None])                    # (N,36,1,Bp)
    rut = blast(jnp.pad(ru_vec.astype(f32), ((0, 0), (0, 0), (0, pu)))[..., None])
    drt = blast(defects.astype(f32)[:, :, None, :])               # (N,1,36,Bp)
    PNt = blast(P_N.astype(f32))                                  # (36,36,Bp)
    pNt = blast(p_N.astype(f32)[..., None])                       # (36,1,Bp)

    nb = Bp // LB
    node = lambda i, j: (N - 1 - j, 0, 0, i)
    fixed = lambda i, j: (0, 0, i)
    grid = (nb, N)
    in_specs = [
        pl.BlockSpec((1, NXK, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, NUP, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NXK, 1, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, 1, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((NXK, NXK, LB), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((NXK, 1, LB), fixed, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, NUK, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUK, 1, LB), node, memory_space=pltpu.VMEM),
    ]
    Kt, kfft = pl.pallas_call(
        functools.partial(_riccati_kernel, float(h), float(lm), N, interpret,
                          unrolled, None, False),
        out_shape=[
            jax.ShapeDtypeStruct((N, NUK, NXK, Bp), f32),
            jax.ShapeDtypeStruct((N, NUK, 1, Bp), f32),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((NXK, NXK, LB), f32),
            pltpu.VMEM((NXK, 1, LB), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(Qt, Rt, Mt, qxt, rut, drt, PNt, pNt)
    K = jnp.moveaxis(Kt, -1, 0)[:B]                 # (B, N, 30, 36)
    kff = jnp.moveaxis(kfft[..., 0, :], -1, 0)[:B]  # (B, N, 30)
    return K, kff


def riccati_pallas_lane_major(h: float, lm: float, Qt, Rt, MTt, qxt, rut,
                              defects, P_N=None, p_N=None, *,
                              terminal=None, interpret: bool = False,
                              raw_out: bool = False
                              ) -> Tuple[jax.Array, jax.Array]:
    """Fused sweep on GN blocks already in kernel layout (node-major lanes):
    Qt (N,36,36,Bp), Rt (N,32,32,Bp), MTt (N,32,36,Bp), qxt (N,36,1,Bp),
    rut (N,32,1,Bp) — exactly what ops/dynjac_kernel.lingram_lane_major
    emits, so the two kernels chain with no repacking. defects (B,N,36) is
    blasted here (small). The terminal value function comes either
    precomputed as P_N (B,36,36) / p_N (B,36), or — preferred — is built
    INSIDE the kernel from `terminal=(xN (B,36), xref_e (B,36),
    peak_N (B,4), step_h (B,), fk_consts, wTe2 (36,), swing (4,), reg)`
    via a q-only dual FK pass (no XLA jacfwd, no (B,36,36) HBM traffic).
    Returns K,kff batch-major (B,N,30,36)/(B,N,30)."""
    N, Bp = Qt.shape[0], Qt.shape[-1]
    B = defects.shape[0]
    pad = Bp - B
    f32 = jnp.float32

    def blast(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        return jnp.moveaxis(x, 0, -1)

    drt = blast(defects.astype(f32)[:, :, None, :])               # (N,1,36,Bp)

    nb = Bp // LB
    node = lambda i, j: (N - 1 - j, 0, 0, i)
    fixed = lambda i, j: (0, 0, i)
    in_specs = [
        pl.BlockSpec((1, NXK, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, NUP, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NXK, 1, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, 1, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NXK, LB), node, memory_space=pltpu.VMEM),
    ]
    if terminal is None:
        term = None
        extra = [blast(P_N.astype(f32)), blast(p_N.astype(f32)[..., None])]
        in_specs += [
            pl.BlockSpec((NXK, NXK, LB), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((NXK, 1, LB), fixed, memory_space=pltpu.VMEM),
        ]
    else:
        xN, xref_e, peak_N, step_h, consts, wTe2, swing, reg = terminal
        term = (consts, wTe2, swing, reg)
        col = lambda x: blast(x.astype(f32)[..., None])           # (d,1,Bp)
        extra = [col(xN), col(xref_e), col(peak_N),
                 col(step_h.reshape(-1, 1))]
        in_specs += [
            pl.BlockSpec((NXK, 1, LB), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((NXK, 1, LB), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, LB), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LB), fixed, memory_space=pltpu.VMEM),
        ]
    out_specs = [
        pl.BlockSpec((1, NUK, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUK, 1, LB), node, memory_space=pltpu.VMEM),
    ]
    Kt, kfft = pl.pallas_call(
        functools.partial(_riccati_kernel, float(h), float(lm), N, interpret,
                          True, term, False),
        out_shape=[
            jax.ShapeDtypeStruct((N, NUK, NXK, Bp), f32),
            jax.ShapeDtypeStruct((N, NUK, 1, Bp), f32),
        ],
        grid=(nb, N),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((NXK, NXK, LB), f32),
            pltpu.VMEM((NXK, 1, LB), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(Qt, Rt, MTt, qxt, rut, drt, *extra)
    if raw_out:
        return Kt, kfft                             # lane-major, for chaining
    K = jnp.moveaxis(Kt, -1, 0)[:B]                 # (B, N, 30, 36)
    kff = jnp.moveaxis(kfft[..., 0, :], -1, 0)[:B]  # (B, N, 30)
    return K, kff


def riccati_rollout_lane_major(h: float, lm: float, Qt, Rt, MTt, qxt, rut,
                               defects, dx0, P_N=None, p_N=None, *,
                               terminal=None, interpret: bool = False
                               ) -> Tuple[jax.Array, jax.Array]:
    """Fused backward sweep + affine rollout in ONE kernel: the gains
    (K, kff) live in VMEM scratch across the node grid and the alpha=1
    rollout runs inside the last grid step (node 0), so K/kff NEVER reach
    HBM (~120 MB round-trip saved at B=512, N=25, plus a kernel launch).
    Inputs as riccati_pallas_lane_major plus dx0 (B, 36) batch-major.
    Returns dX1 (B, N+1, 36), dU1 (B, N, 30) batch-major (f32).
    """
    N, Bp = Qt.shape[0], Qt.shape[-1]
    B = defects.shape[0]
    pad = Bp - B
    f32 = jnp.float32

    def blast(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        return jnp.moveaxis(x, 0, -1)

    drt = blast(defects.astype(f32)[:, :, None, :])               # (N,1,36,Bp)
    x0 = dx0.astype(f32)
    if pad:
        x0 = jnp.concatenate([x0, jnp.zeros((pad, NXK), f32)], axis=0)
    dx0t = jnp.moveaxis(x0, 0, -1)[None]                          # (1,36,Bp)

    nb = Bp // LB
    node = lambda i, j: (N - 1 - j, 0, 0, i)
    fixed3 = lambda i, j: (0, 0, i)
    fixed4 = lambda i, j: (0, 0, 0, i)
    in_specs = [
        pl.BlockSpec((1, NXK, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, NUP, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, NXK, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NXK, 1, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NUP, 1, LB), node, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NXK, LB), node, memory_space=pltpu.VMEM),
    ]
    if terminal is None:
        term = None
        extra = [blast(P_N.astype(f32)), blast(p_N.astype(f32)[..., None])]
        in_specs += [
            pl.BlockSpec((NXK, NXK, LB), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((NXK, 1, LB), fixed3, memory_space=pltpu.VMEM),
        ]
    else:
        xN, xref_e, peak_N, step_h, consts, wTe2, swing, reg = terminal
        term = (consts, wTe2, swing, reg)
        col = lambda x: blast(x.astype(f32)[..., None])           # (d,1,Bp)
        extra = [col(xN), col(xref_e), col(peak_N),
                 col(step_h.reshape(-1, 1))]
        in_specs += [
            pl.BlockSpec((NXK, 1, LB), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((NXK, 1, LB), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, LB), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LB), fixed3, memory_space=pltpu.VMEM),
        ]
    # the full defect stack again, as ONE fixed block for the in-kernel
    # rollout (the streamed per-node copy above feeds the backward sweep)
    in_specs += [
        pl.BlockSpec((N, 1, NXK, LB), fixed4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NXK, LB), fixed3, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((N + 1, 1, NXK, LB), fixed4, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, NUK, 1, LB), fixed4, memory_space=pltpu.VMEM),
    ]
    dXt, dUt = pl.pallas_call(
        functools.partial(_riccati_kernel, float(h), float(lm), N, interpret,
                          True, term, True),
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, 1, NXK, Bp), f32),
            jax.ShapeDtypeStruct((N, NUK, 1, Bp), f32),
        ],
        grid=(nb, N),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((NXK, NXK, LB), f32),
            pltpu.VMEM((NXK, 1, LB), f32),
            pltpu.VMEM((N, NUK, NXK, LB), f32),
            pltpu.VMEM((N, NUK, 1, LB), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # gains scratch (N,30,36,128) f32 ~ 17.7 MB exceeds the 16 MiB
            # default scoped budget; v5e-class assumption as in
            # dynjac_kernel.lingram_lane_major (ADVICE r1 note applies)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Qt, Rt, MTt, qxt, rut, drt, *extra, drt, dx0t)
    dX = jnp.moveaxis(dXt[:, 0], -1, 0)[:B]         # (B, N+1, 36)
    dU = jnp.moveaxis(dUt[..., 0, :], -1, 0)[:B]    # (B, N, 30)
    return dX, dU


def _forward_kernel(h: float, interpret: bool,
                    K_ref, kff_ref, dr_ref, dx0_ref,
                    dX_ref, dU_ref, dxN_ref, dx_s):
    """One (batch-tile, node) step of the affine rollout at alpha=1:
    du = K dx + kff; dx' = A dx + B du + defect, with the double-integrator
    A/B applied as sublane rolls + masks (see sqp._forward_delta_structured
    for the math). dx lives in VMEM scratch as a (1, 36, L) row across the
    node dimension; du is formed as a (30, 1, L) column by one masked
    sublane reduction — no transposes anywhere."""
    j = pl.program_id(1)
    hh = 0.5 * h * h
    f32 = jnp.float32

    roll = (lambda x, s: jnp.roll(x, s, axis=1)) if interpret else (
        lambda x, s: pltpu.roll(x, s, axis=1))

    @pl.when(j == 0)
    def _():
        dx_s[...] = dx0_ref[...]

    dx = dx_s[...]                                  # (1, 36, L)
    K = K_ref[0]                                    # (30, 36, L)
    kff = kff_ref[0]                                # (30, 1, L)
    d = dr_ref[0]                                   # (1, 36, L)

    du = jnp.sum(K * dx, axis=1, keepdims=True) + kff   # (30, 1, L)

    # du_acc rows 0..17 spread onto sublanes, duplicated into both column
    # halves: du36[:, c] = du[c % 18] (each term is a free vreg select on
    # the untiled leading dim times an iota mask)
    i32 = jnp.int32
    cv = jax.lax.broadcasted_iota(i32, (1, NXK, 1), 1)
    du36 = sum(du[r:r + 1] * _f((cv == r) | (cv == r + 18)) for r in range(18))
    maskq = _f(cv < 18)

    dx_vshift = roll(dx, 18) * maskq                # v-block moved to q cols
    dx_next = (dx + h * dx_vshift
               + du36 * (hh * maskq + h * (1.0 - maskq)) + d)

    dX_ref[0] = dx
    dU_ref[0] = du
    dxN_ref[...] = dx_next                          # last write (j=N-1) wins
    dx_s[...] = dx_next


def forward_rollout_lane_major(h: float, Kt, kfft, drt, dx0, *,
                               interpret: bool = False
                               ) -> Tuple[jax.Array, jax.Array]:
    """Affine rollout at alpha=1 consuming the Riccati kernel's raw
    lane-major outputs: Kt (N,30,36,Bp), kfft (N,30,1,Bp),
    drt (N,1,36,Bp) defects-as-rows (same array the Riccati kernel ate),
    dx0 (B,36) batch-major. Returns dX1 (B,N+1,36), dU1 (B,N,30) —
    K and kff never exist batch-major in HBM."""
    N, Bp = Kt.shape[0], Kt.shape[-1]
    B = dx0.shape[0]
    pad = Bp - B
    f32 = jnp.float32

    x0 = dx0.astype(f32)
    if pad:
        x0 = jnp.concatenate([x0, jnp.zeros((pad, NXK), f32)], axis=0)
    dx0t = jnp.moveaxis(x0, 0, -1)[None]            # (1, 36, Bp)

    nb = Bp // LB
    node = lambda i, j: (j, 0, 0, i)
    fixed = lambda i, j: (0, 0, i)
    dXt, dUt, dxNt = pl.pallas_call(
        functools.partial(_forward_kernel, float(h), interpret),
        out_shape=[
            jax.ShapeDtypeStruct((N, 1, NXK, Bp), f32),
            jax.ShapeDtypeStruct((N, NUK, 1, Bp), f32),
            jax.ShapeDtypeStruct((1, NXK, Bp), f32),
        ],
        grid=(nb, N),
        in_specs=[
            pl.BlockSpec((1, NUK, NXK, LB), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUK, 1, LB), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NXK, LB), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NXK, LB), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NXK, LB), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUK, 1, LB), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NXK, LB), fixed, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, NXK, LB), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(Kt, kfft, drt, dx0t)
    dX = jnp.moveaxis(dXt[:, 0], -1, 0)[:B]         # (B, N, 36)
    dxN = jnp.moveaxis(dxNt[0], -1, 0)[:B]          # (B, 36)
    dU = jnp.moveaxis(dUt[..., 0, :], -1, 0)[:B]    # (B, N, 30)
    return jnp.concatenate([dX, dxN[:, None]], axis=1), dU


def make_riccati_pallas(h: float, lm: float, interpret: bool = False):
    """custom_vmap wrapper: sequential scan for unbatched solves (latency),
    the fused kernel when the solve is vmapped over a problem batch."""
    from ..solver.sqp import _riccati_solve_structured

    @jax.custom_batching.custom_vmap
    def riccati(Q, R, M, qx_vec, ru_vec, P_N, p_N, defects):
        return _riccati_solve_structured(
            h, Q, R, M, qx_vec, ru_vec, P_N, p_N, defects,
            jnp.asarray(lm, Q.dtype))

    @riccati.def_vmap
    def _rule(axis_size, in_batched, Q, R, M, qx_vec, ru_vec, P_N, p_N,
              defects):
        args = []
        for x, b in zip((Q, R, M, qx_vec, ru_vec, P_N, p_N, defects),
                        in_batched):
            args.append(x if b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape))
        K, kff = riccati_pallas_batched(h, lm, *args, interpret=interpret)
        return (K, kff), (True, True)

    return riccati
