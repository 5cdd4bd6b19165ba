"""Roofline accounting for the two production Pallas kernels (VERDICT r3
item 4): is the three-round ~105k solves/s plateau speed-of-light or
schedule slack?

Method (measured, not quoted):
1. EMPIRICAL chip ceilings on this v5e, via micro-kernels:
   - VPU fp32 peak: a Pallas kernel that runs a long FMA chain on
     VMEM-resident tiles (both kernels are deliberately VPU-elementwise,
     batch-in-lanes — the MXU bf16 peak is not the relevant roof),
   - HBM bandwidth: a streaming read+write (x + 1) over a 1 GiB array.
2. Kernel timings at the production shape (B=512, N=25) on real
   solver-shaped inputs.
3. EXACT HBM byte counts from the kernel interface shapes (fp32).
4. ALGORITHMIC FLOPs from hand-derived per-node operation counts
   (formulas in `algo_flops_*` below, auditable term by term) — the
   minimum arithmetic any implementation of the same math must do.
   The kernels EXECUTE more than this (masked full-matrix ops in the
   unrolled Cholesky/substitutions trade wasted lanes for static
   indexing), so pct_vpu_peak is a LOWER bound on VPU utilization.

    python scripts/roofline.py                  # TPU, writes ROOFLINE.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

B, N = 512, 25
NX, NU, NUP = 36, 30, 32


def flagship_batch():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    solver, X, U, params = _flagship()
    warm = jax.jit(lambda X, U, p: solver.solve(X, U, p, 15))
    sol = warm(X, U, params)
    _ = float(jnp.sum(sol.X))
    from profile_lin import batch_inputs

    Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, B)
    return solver, Xb, Ub, pb


def algo_flops_lingram():
    """Per-(node, problem) algorithmic MACs of linearize+Gram, x2 for FLOPs.

    Row structure of the 130-row stage Jacobian (solver/linearize.py):
    - Jacobian build: 40 x-tangent dual numbers through the leg
      kinematics + RNEA recursion. One structured FK+RNEA evaluation for
      the 18-dof quadruped is ~1.1k MACs (analytic base + 4 legs x 3
      links x ~30 ops x 3 components); each of the 40 tangent rows pays
      the multiply-add half of every product rule (~1.5x value cost
      after constant folding of spec constants).
    - analytic ypr mass matrix (d tau/d a): symmetric 18x18, leg-block
      sparse: ~4k MACs.
    - Gram accumulation G += r_w * J_row^T J_row by row group:
      18 dynamics + 12 torque rows touch all 66 cols: 30 * 66*67/2;
      24 foot-kinematic rows touch 36 x-cols: 24 * 36*37/2;
      ~56 diagonal tracking/acc/force rows: ~56 adds (negligible).
    """
    rnea = 1100.0
    jac = 40 * 1.5 * rnea + 4000.0
    gram = 30 * (66 * 67 / 2) + 24 * (36 * 37 / 2)
    return 2.0 * (jac + gram) * B * N


def algo_flops_riccati():
    """Per-(node, problem) algorithmic MACs of the structured backward
    sweep + affine rollout, x2 for FLOPs (sqp._riccati_solve_structured).

    - Quu~ = R + B^T P B via structured A/B: O(nx^2) scale-adds ~ 3*36^2
    - Cholesky(30):            30^3/3
    - W = L^-1 Qux~ (30x36):   30^2*36/2
    - K backsolve L^-T W:      30^2*36/2
    - P' = Qxx~ - W^T W (sym): 36^2*30/2
    - vectors kff, p':         ~2*30*36
    - structured A-products:   ~4*36^2 masked roll scale-adds
    - forward rollout du=Kdx+kff, dx'=Adx+Bdu+d: (30*36 + ~3*36)/node
    """
    sweep = (3 * 36**2 + 30**3 / 3 + 30**2 * 36 / 2 + 30**2 * 36 / 2
             + 36**2 * 30 / 2 + 2 * 30 * 36 + 4 * 36**2)
    roll = 30 * 36 + 3 * 36
    return 2.0 * (sweep + roll) * B * N


def vpu_peak_tflops():
    """Empirical fp32 elementwise-compute ceiling, two probes:

    (a) Pallas VMEM-resident FMA chains (4 independent accumulators over a
        (512,128) tile, 1024 iterations),
    (b) XLA fused 80-FLOP/element polynomial over 64 MiB (compute-bound at
        10 FLOP/byte given ~700 GB/s HBM).

    The max of the two is the PRACTICAL fp32 VPU ceiling on this chip for
    compiler-scheduled elementwise code — the relevant roof for these
    batch-in-lanes kernels (they never touch the MXU). The theoretical
    vreg-issue bound (8x128-lane FMA/cycle x ~0.94 GHz x multiple ALUs)
    is ~2-8 TFLOP/s depending on issue width; both measured probes land
    well under it, consistent with loop/issue overheads dominating
    dependent elementwise chains.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from _timing import timeit

    ROWS, IT, G, NACC = 512, 1024, 8, 4

    def kern(a_ref, b_ref, o_ref):
        b = b_ref[...]
        xs = tuple(a_ref[...] * (1.0 + 0.001 * k) for k in range(NACC))
        xs = jax.lax.fori_loop(
            0, IT, lambda i, xs: tuple(x * b + b for x in xs), xs)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] = acc

    a = jnp.ones((ROWS, 128), jnp.float32) * 0.999
    b = jnp.ones((ROWS, 128), jnp.float32) * 1e-6
    fn = jax.jit(lambda a, b: pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
    )(a, b))
    t_ms = timeit(fn, a, b, reps=10)
    tf_pallas = (2.0 * ROWS * 128 * IT * G * NACC) / (t_ms * 1e-3) / 1e12

    n = 64 * 1024 * 1024            # 256 MiB: big enough that the 80-FLOP
    x = jnp.linspace(0.1, 1.0, n)   # chain dwarfs the tunnel round-trip

    def poly(x):
        y = x
        for _ in range(40):
            y = y * x + x
        return y

    f = jax.jit(poly)
    t2 = max(timeit(f, x, reps=50), 1e-3)
    tf_xla = (80.0 * n) / (t2 * 1e-3) / 1e12
    return max(tf_pallas, tf_xla), {"pallas_fma_TFLOPs": round(tf_pallas, 3),
                                    "xla_poly_TFLOPs": round(tf_xla, 3)}


def hbm_bw_gbs():
    """Empirical HBM streaming bandwidth: read + write 1 GiB."""
    import jax
    import jax.numpy as jnp

    n = 256 * 1024 * 1024  # 1 GiB of f32
    x = jnp.ones((n,), jnp.float32)
    fn = jax.jit(lambda x: x + 1.0)
    from _timing import timeit

    t_ms = timeit(fn, x, reps=10)
    return (2.0 * 4.0 * n) / (t_ms * 1e-3) / 1e9, t_ms


def tpu_measure():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from _timing import timeit

    from iterative_learning_nmpc_tpu.ops.dynjac_kernel import (
        lingram_lane_major,
    )
    from iterative_learning_nmpc_tpu.ops.riccati_kernel import (
        riccati_pallas_batched,
    )

    dev = jax.devices()[0].device_kind
    print(f"device: {dev}", flush=True)

    vpu_tf, vpu_detail = vpu_peak_tflops()
    print(f"empirical VPU fp32 ceiling: {vpu_tf:.2f} TFLOP/s "
          f"({vpu_detail})", flush=True)
    bw, t_bw = hbm_bw_gbs()
    print(f"empirical HBM bandwidth: {bw:.0f} GB/s ({t_bw:.2f} ms micro)",
          flush=True)

    solver, Xb, Ub, pb = flagship_batch()
    spec, w = solver.spec, solver.weights
    inc = solver.opt.torque_limit_in_qp

    lin = jax.jit(lambda X, U, p: lingram_lane_major(
        spec, w, X, U, p, include_torque=inc))
    t0 = time.perf_counter()
    out = lin(Xb, Ub, pb)
    _ = float(jnp.sum(out[0]))
    print(f"lingram compile {time.perf_counter()-t0:.0f}s", flush=True)
    t_lin = min(timeit(lin, Xb, Ub, pb) for _ in range(3))

    rng = np.random.RandomState(0)
    mk = lambda *s: rng.randn(*s).astype(np.float32)
    Jq = mk(B, N, 50, NX)
    Jr = mk(B, N, 50, NU)
    Q = np.einsum("bnri,bnrj->bnij", Jq, Jq) + 1e-3 * np.eye(NX, dtype=np.float32)
    R = np.einsum("bnri,bnrj->bnij", Jr, Jr) + np.eye(NU, dtype=np.float32)
    M = 0.1 * np.einsum("bnri,bnrj->bnij", Jq, Jr)
    qx, ru = mk(B, N, NX), mk(B, N, NU)
    PT = mk(B, 60, NX)
    P_N = np.einsum("bri,brj->bij", PT, PT) + np.eye(NX, dtype=np.float32)
    p_N = mk(B, NX)
    d = 0.01 * mk(B, N, NX)
    args = tuple(map(jnp.asarray, (Q, R, M, qx, ru, P_N, p_N, d)))
    ric = jax.jit(lambda *a: riccati_pallas_batched(
        solver.dt_nodes, 1e-6, *a, unrolled=True))
    t0 = time.perf_counter()
    o = ric(*args)
    _ = float(jnp.sum(o[0]))
    print(f"riccati compile {time.perf_counter()-t0:.0f}s", flush=True)
    t_ric = min(timeit(ric, *args) for _ in range(3))

    # ---- exact fp32 interface bytes ----
    per_np_in_lin = (NX + 18 + 12 + 4 + 4 + 4 + 8 + 4 + 1 + 18 + 36 + 48 + 1)
    lin_in = per_np_in_lin * 4 * B * N
    blocks = NX * NX + NUP * NUP + NUP * NX + NX + NUP
    lin_out = blocks * 4 * B * N
    ric_in = blocks * 4 * B * N + (NX * NX + NX) * 4 * B + NX * 4 * B * N
    ric_out = (NU * NX + NU) * 4 * B * N

    flops = {"lingram_flops": algo_flops_lingram(),
             "riccati_flops": algo_flops_riccati()}

    def roof(name, t_ms, bytes_io, algo_flops):
        gbs = bytes_io / (t_ms * 1e-3) / 1e9
        tf = (algo_flops / (t_ms * 1e-3) / 1e12) if algo_flops else None
        return {
            "time_ms": round(t_ms, 3),
            "hbm_bytes": bytes_io,
            "achieved_GBps": round(gbs, 1),
            "pct_hbm_peak": round(100 * gbs / bw, 1),
            "algorithmic_flops": algo_flops,
            "achieved_algo_TFLOPs": round(tf, 3) if tf else None,
            "pct_vpu_peak": round(100 * tf / vpu_tf, 1) if tf else None,
            "bw_floor_ms": round(bytes_io / (bw * 1e9) * 1e3, 3),
            "vpu_floor_ms": round(
                algo_flops / (vpu_tf * 1e12) * 1e3, 3) if algo_flops else None,
        }

    out = {
        "what": ("roofline accounting of the two production Pallas kernels "
                 "at B=512, N=25 vs EMPIRICAL chip ceilings (micro-kernel "
                 "measured, not datasheet)"),
        "device": dev,
        "empirical_vpu_fp32_TFLOPs": round(vpu_tf, 2),
        "vpu_probes": vpu_detail,
        "empirical_hbm_GBps": round(bw, 0),
        "lingram": roof("lingram", t_lin, lin_in + lin_out,
                        flops.get("lingram_flops")),
        "riccati": roof("riccati", t_ric, ric_in + ric_out,
                        flops.get("riccati_flops")),
        "date": time.strftime("%Y-%m-%d"),
    }
    path = os.path.join(ROOT, "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    argparse.ArgumentParser().parse_args()
    tpu_measure()
