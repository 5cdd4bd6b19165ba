"""Benchmark: NMPC solves/s on the real TPU chip + the 1e-3 CPU parity gate.

Prints ONE JSON line:
  {"metric": "nmpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 25.0, ...extras}

Baseline: the reference's implied real-time budget is 25 solves/s
(40 ms per async solve at 25 Hz replanning — BASELINE.md). The north-star
target is >= 1000 full-horizon solves/s per chip (BASELINE.json).

Regime measured: steady-state RTI (1 SQP iteration, warm-started primal AND
dual — the closed-loop regime of mpc/controller.py and learning/ondevice.py),
batch of perturbed Go2 trot instances at the reference's OCP size (N=25
nodes, 1 s horizon). The timed loop is a lax.scan chained on-device; the
value reported is the MEDIAN of 3 timed runs with the spread attached
(the axon tunnel adds +-30% noise to single wall-clock samples — CLAUDE.md).

Parity gate (BASELINE.md: control sequences within 1e-3 of the CPU
reference): the converged solve AND one steady-state RTI step are each run
through the TPU Pallas path and the XLA CPU path (sequential Riccati +
jacfwd linearization) on the same instance; `max_du_vs_cpu` is the max
elementwise |dU| difference normalized by (1 + |U_cpu|) over both
comparisons and the bench FAILS (exit 1) if it exceeds 1e-3. This is the
only place the compiled-Mosaic kernels are checked numerically against XLA
(unit tests cover interpret mode). Measured 3.2e-4 / 2.0e-4.

As a side artifact, spawns scripts/bench_multichip.py (virtual 8-device CPU
mesh) to write BENCH_MULTI.json: sharded-vs-single equality + scaling table.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _rti_chain(solver, reps):
    """Warm-started RTI steps chained on-device with full dual carry-over:
    each step re-solves from the previous solution + annealed multipliers —
    exactly how the solver runs inside on-device datagen / closed loop."""
    import dataclasses

    import jax

    def chain(X, U, lam, lami, p):
        def step(carry, _):
            X, U, lam, lami = carry
            pj = dataclasses.replace(p, lam_eq=lam, lam_ineq=lami)
            s = solver.solve(X, U, pj, 1)
            lam_new = solver.update_multipliers(s.X, s.U, pj, r_eq=s.r_eq)
            return (s.X, s.U, lam_new, s.lam_ineq), (s.stats.cost,
                                                     s.stats.qp_iters)
        carry, (costs, qpi) = jax.lax.scan(
            step, (X, U, lam, lami), None, length=reps)
        return carry, costs[-1], qpi

    return chain


def _instance(gait_name, time_opt=False, n_iter_boost=None):
    """Parameterized bench instance: any catalog gait at the production OCP
    size (the _flagship builder generalized beyond trot for the parity
    sweep)."""
    import jax

    from iterative_learning_nmpc_tpu.gait.planner import ContactPlanner
    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.robots.go2 import go2_spec
    from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params

    spec = go2_spec()
    gait, opt, cost = get_quadruped_config(gait_name, "go2")
    if time_opt:
        opt.enable_time_opt = True
    solver = TrajOptSolver(spec, opt, cost)
    N = solver.N
    planner = ContactPlanner(spec.feet_frame_names, solver.dt_nodes, gait)
    q0 = np.asarray(spec.q_home, dtype=np.float32).copy()
    p0 = np.asarray(jax.jit(lambda qq: dyn.foot_positions(spec, qq))(q0))
    q0[2] += -p0[0, 2] + float(np.asarray(spec.foot_radius))
    x0 = np.concatenate([q0, np.zeros(18, np.float32)])
    cnt = planner.get_contacts(0, N + 1).astype(np.float32)
    base_ref = np.zeros(12, np.float32)
    base_ref[:3] = q0[:3]
    base_ref[2] = gait.nom_height
    base_ref[6] = 0.3
    base_ref_e = base_ref.copy()
    base_ref_e[0] += 0.3
    params = make_params(
        solver, x0, cnt, base_ref=base_ref, base_ref_e=base_ref_e,
        step_height=gait.step_height,
        ground_height=float(np.asarray(spec.foot_radius)))
    return solver, params


def _cpu_solver(gait_name, time_opt=False):
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.robots.go2 import go2_spec
    from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver

    _, opt, cost = get_quadruped_config(gait_name, "go2")
    opt.riccati_mode = "sequential"
    opt.linearize_mode = "jacfwd"
    if time_opt:
        opt.enable_time_opt = True
    return TrajOptSolver(go2_spec(), opt, cost)


def parity_sweep(rel):
    """Compiled-kernel parity beyond the headline trot instance
    (VERDICT r2 item 4): >=3 gaits (incl. bound's paired-flight masks),
    cold-start multi-iteration AND steady-state RTI, a batch-512 case
    (kernel grids tile differently at large batch), and the per-node
    time_opt path. Every case: TPU Pallas path vs XLA-CPU sequential path
    on identical inputs, rel-|dU| gated at 1e-3.
    """
    import jax
    import jax.numpy as jnp

    cpu_dev = jax.devices("cpu")[0]
    out = {}

    for gait, topt in (("bound", False), ("crawl", False), ("trot", True)):
        tag = gait + ("_topt" if topt else "")
        solver, params = _instance(gait, time_opt=topt)
        X, U = jax.jit(solver.cold_start)(params)
        # (a) cold-start agreement at the converged fixed point (15
        # iterations) and — where well-posed — at a fixed mid-convergence
        # count (6; restored per ADVICE r3 after the deterministic
        # line-search tie-break). The time_opt instance stays
        # fixed-point-only, with the r3 "alpha tie" diagnosis CORRECTED
        # by measurement (r4): iteration-by-iteration, both backends pick
        # IDENTICAL alphas (1.0, 0.25, 1.0, ...) yet differ 7.3e-3
        # relative after the very first GN step from the cold point —
        # the bilinear per-node-dt linearization amplifies backend fp
        # differences at the ill-conditioned stationary start — and then
        # CONTRACT to agreement (2.9e-3 @it2, 7.2e-4 @it5, 3.8e-4 @15).
        # A mid-convergence elementwise gate on that path would assert on
        # transient amplification, not kernel parity; the per-step kernel
        # parity is covered by the rti1 case below (2e-4).
        s_t = jax.jit(lambda x, u, p: solver.solve(x, u, p, 15))(X, U, params)
        s_t6 = (None if topt else
                jax.jit(lambda x, u, p: solver.solve(x, u, p, 6))(X, U, params))
        jax.block_until_ready(s_t.U)
        solver_c = _cpu_solver(gait, time_opt=topt)
        with jax.default_device(cpu_dev):
            s_c = jax.jit(lambda x, u, p: solver_c.solve(x, u, p, 15))(
                np.asarray(X), np.asarray(U), jax.tree.map(np.asarray, params))
            U_c = np.asarray(s_c.U)
            if not topt:
                s_c6 = jax.jit(lambda x, u, p: solver_c.solve(x, u, p, 6))(
                    np.asarray(X), np.asarray(U),
                    jax.tree.map(np.asarray, params))
                U_c6 = np.asarray(s_c6.U)
        out[f"{tag}_cold_conv"] = rel(np.asarray(s_t.U), U_c)
        if not topt:
            out[f"{tag}_cold_it6"] = rel(np.asarray(s_t6.U), U_c6)
        # (b) steady-state RTI step from the TPU 15-iter converged point
        s_conv = s_t
        import dataclasses as _dc

        p1 = _dc.replace(jax.tree.map(lambda x: np.asarray(x), params),
                         lam_ineq=np.asarray(s_conv.lam_ineq))
        Xc, Uc = np.asarray(s_conv.X), np.asarray(s_conv.U)
        s_t1 = jax.jit(lambda x, u, p: solver.solve(x, u, p, 1))(Xc, Uc, p1)
        jax.block_until_ready(s_t1.U)
        with jax.default_device(cpu_dev):
            s_c1 = jax.jit(lambda x, u, p: solver_c.solve(x, u, p, 1))(Xc, Uc, p1)
            U_c1 = np.asarray(s_c1.U)
        out[f"{tag}_rti1"] = rel(np.asarray(s_t1.U), U_c1)

    # (c) batch-512 tiling case: identical trot instance replicated; every
    # row must match the CPU single-instance RTI step (catches batch-size-
    # gated kernel bugs the b=8 headline gate cannot see)
    solver, params = _instance("trot")
    X, U = jax.jit(solver.cold_start)(params)
    s_conv = jax.jit(lambda x, u, p: solver.solve(x, u, p, 15))(X, U, params)
    jax.block_until_ready(s_conv.U)
    import dataclasses as _dc

    p1 = _dc.replace(jax.tree.map(lambda x: np.asarray(x), params),
                     lam_ineq=np.asarray(s_conv.lam_ineq))
    Xc, Uc = np.asarray(s_conv.X), np.asarray(s_conv.U)
    B = int(os.environ.get("BENCH_SWEEP_B", "512"))
    pb = jax.tree.map(lambda x: np.broadcast_to(x[None], (B,) + x.shape), p1)
    s_b = jax.jit(jax.vmap(lambda x, u, p: solver.solve(x, u, p, 1)))(
        np.broadcast_to(Xc[None], (B,) + Xc.shape),
        np.broadcast_to(Uc[None], (B,) + Uc.shape), pb)
    U_b = np.asarray(s_b.U)
    solver_c = _cpu_solver("trot")
    with jax.default_device(cpu_dev):
        s_c1 = jax.jit(lambda x, u, p: solver_c.solve(x, u, p, 1))(Xc, Uc, p1)
        U_c1 = np.asarray(s_c1.U)
    out[f"trot_b{B}_rti1"] = max(
        rel(U_b[0], U_c1), rel(U_b[B // 2], U_c1), rel(U_b[-1], U_c1))
    # batch self-consistency: identical inputs => identical rows
    out[f"trot_b{B}_rowspread"] = float(
        np.abs(U_b - U_b[:1]).max() / (1.0 + np.abs(U_b[:1]).max()))
    return out


def _probe_device(timeout_s: float = 300.0):
    """Fail fast (with a diagnostic JSON line) when the device is
    unreachable — a wedged axon tunnel otherwise blocks the first op
    forever and the driver sees an eternal hang instead of a result."""
    import threading

    ok = [False]

    def probe():
        import jax
        import jax.numpy as jnp

        jax.block_until_ready(jax.jit(lambda a: a + 1.0)(jnp.ones((2, 2))))
        ok[0] = True

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok[0]:
        print(json.dumps({
            "metric": "nmpc_solves_per_s", "value": 0.0, "unit": "solves/s",
            "vs_baseline": 0.0,
            "error": f"device probe did not complete in {timeout_s:.0f}s "
                     "(TPU tunnel unreachable)",
        }))
        sys.stdout.flush()
        os._exit(3)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    # persistent compile cache: the ~47 s bench compile is paid once per
    # machine, not per run (VERDICT r2 weak-item 7)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _probe_device(float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "300")))

    # B=512 is the measured throughput sweet spot on v5e (111k solves/s vs
    # 106k at 256 and 111k at 1024 — scripts/profile_rti.py methodology);
    # B>=512 needs the raised per-kernel scoped-vmem limit in
    # ops/dynjac_kernel.lingram_lane_major.
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    # reps is the lax.scan length of the timed loop; the axon tunnel adds a
    # fixed ~25 ms per jit call, so enough steps are needed to amortize it
    # (100 steps ~ 270 ms device time => <10% overhead).
    reps = int(os.environ.get("BENCH_REPS", "100"))

    solver, X, U, params = _flagship()
    # converge once, then measure steady-state RTI from the shifted solution
    warm = jax.jit(lambda X, U, p: solver.solve(X, U, p, 15))
    sol = warm(X, U, params)
    jax.block_until_ready(sol.X)

    key = jax.random.PRNGKey(0)
    noise = 0.01 * jax.random.normal(key, (batch, X.shape[-1]))
    pb = jax.tree.map(lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), params)
    pb = pb.__class__(**{**{f: getattr(pb, f) for f in pb.__dataclass_fields__},
                         "x0": pb.x0 + noise})
    Xb = jnp.tile(sol.X[None], (batch, 1, 1)).at[:, 0].set(pb.x0)
    Ub = jnp.tile(sol.U[None], (batch, 1, 1))
    lamb = jnp.zeros((batch, solver.N, 18), jnp.float32)
    lamib = jnp.tile(sol.lam_ineq[None], (batch, 1, 1))

    chain = _rti_chain(solver, reps)

    @jax.jit
    def rti_scan(X, U, lam, lami, p):
        def one(x, u, l, li, pp):
            return chain(x, u, l, li, pp)
        return jax.vmap(one)(X, U, lam, lami, p)

    t0 = time.perf_counter()
    out = rti_scan(Xb, Ub, lamb, lamib, pb)
    # NOTE: block_until_ready over the axon tunnel can return before device
    # execution completes; a scalar device->host readback is the only
    # reliable fence.
    _ = float(jnp.sum(out[0][0][:, 0, 0]))
    compile_s = time.perf_counter() - t0

    # timed steady-state loop, median of 3 (optionally under the JAX
    # profiler: BENCH_PROFILE=/tmp/nmpc_trace writes a TensorBoard trace)
    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    times = []
    for _rep in range(3):
        t0 = time.perf_counter()
        (Xb2, Ub2, _, _), cost, qpi = rti_scan(Xb, Ub, lamb, lamib, pb)
        _ = float(jnp.sum(Xb2[:, 0, 0]))
        times.append(time.perf_counter() - t0)
    if profile_dir:
        jax.profiler.stop_trace()
    dt = float(np.median(times))
    spread_pct = 100.0 * (max(times) - min(times)) / dt
    solves_per_s = batch * reps / dt
    qp_iters_mean = float(jnp.mean(qpi.astype(jnp.float32)))

    # ---- 1e-3 parity gate: TPU Pallas path vs XLA CPU path, same step ----
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.robots.go2 import go2_spec
    from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver
    import dataclasses

    # Two comparisons, both on the SAME instance: (a) the converged 15-iter
    # solve from the same cold start (fixed-point agreement), and (b) one
    # warm-started RTI step from the TPU's converged point (the steady-state
    # step the throughput number measures). A shifted-warm-start comparison
    # is NOT well-posed here: shifting the solution against an unshifted
    # contact schedule manufactures a violent step on which the parallel
    # line search can bifurcate between alpha candidates.
    U_tpu_conv = np.asarray(sol.U)
    X_tpu_conv = np.asarray(sol.X)
    p1 = dataclasses.replace(
        jax.tree.map(lambda x: np.asarray(x), params),
        lam_ineq=np.asarray(sol.lam_ineq))
    # TPU RTI step at the measured batch path (vmapped -> Pallas kernels run)
    pad = jax.tree.map(lambda x: np.broadcast_to(x[None], (8,) + x.shape), p1)
    s_tpu = jax.jit(jax.vmap(lambda x, u, p: solver.solve(x, u, p, 1)))(
        np.broadcast_to(X_tpu_conv[None], (8,) + X_tpu_conv.shape),
        np.broadcast_to(U_tpu_conv[None], (8,) + U_tpu_conv.shape), pad)
    U_tpu_rti = np.asarray(s_tpu.U[0])

    _, opt_cpu, cost_cpu = get_quadruped_config("trot", "go2")
    opt_cpu.riccati_mode = "sequential"
    opt_cpu.linearize_mode = "jacfwd"
    solver_cpu = TrajOptSolver(go2_spec(), opt_cpu, cost_cpu)
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        sol_cpu = jax.jit(lambda x, u, p: solver_cpu.solve(x, u, p, 15))(
            np.asarray(X), np.asarray(U), jax.tree.map(np.asarray, params))
        U_cpu_conv = np.asarray(sol_cpu.U)
        s_cpu = jax.jit(lambda x, u, p: solver_cpu.solve(x, u, p, 1))(
            X_tpu_conv, U_tpu_conv, p1)
        U_cpu_rti = np.asarray(s_cpu.U)
    rel = lambda a, b: float(np.max(np.abs(a - b) / (1.0 + np.abs(b))))
    max_du = max(rel(U_tpu_conv, U_cpu_conv), rel(U_tpu_rti, U_cpu_rti))

    # ---- converged-cost anchor (solution-QUALITY regression gate): the
    # parity gate catches TPU-vs-CPU divergence but not "both paths got
    # worse together" (VERDICT r2 weak-item 2). BENCH_ANCHOR.json pins the
    # converged cost of this exact instance; both backends must stay within
    # the band. Update the anchor file deliberately when the instance
    # definition changes.
    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_ANCHOR.json")
    cost_tpu_conv = float(np.asarray(sol.stats.cost))
    cost_cpu_conv = float(np.asarray(sol_cpu.stats.cost))
    anchor_gate, anchor_ratio = "no-anchor", None
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor = json.load(f)
        ref_cost = float(anchor["converged_cost_cpu"])
        tol = float(anchor.get("tol_rel", 0.2))
        anchor_ratio = round(max(cost_tpu_conv, cost_cpu_conv) / ref_cost, 4)
        ok = (abs(cost_tpu_conv / ref_cost - 1.0) <= tol
              and abs(cost_cpu_conv / ref_cost - 1.0) <= tol)
        anchor_gate = "pass" if ok else "FAIL"

    # ---- parity sweep across gaits/batch/time_opt (skippable for quick
    # local runs: BENCH_SWEEP=0) ----
    sweep_max, sweep_note = None, "skipped"
    if os.environ.get("BENCH_SWEEP", "1") != "0":
        sweep = parity_sweep(rel)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "PARITY_SWEEP.json"), "w") as f:
            json.dump(sweep, f, indent=1)
        sweep_max = max(sweep.values())
        sweep_note = "pass" if sweep_max <= 1.0e-3 else "FAIL"

    # single-solve latency (batch=1) — the per-step real-time budget check.
    # Chained on-device (scan) so the number is device latency, not the
    # axon-tunnel round trip (~5-10 ms) a per-call loop would measure.
    @jax.jit
    def rti_one_scan(X, U, lam, lami, p):
        return chain(X, U, lam, lami, p)

    x1 = jax.tree.map(lambda x: x[0], pb)
    o = rti_one_scan(Xb[0], Ub[0], lamb[0], lamib[0], x1)
    _ = float(jnp.sum(o[0][0][0]))
    t0 = time.perf_counter()
    o = rti_one_scan(Xb[0], Ub[0], lamb[0], lamib[0], x1)
    _ = float(jnp.sum(o[0][0][0]))
    lat_ms = (time.perf_counter() - t0) / reps * 1e3

    # ---- side artifact: virtual-mesh scaling + sharded equality ----
    multi_note = "skipped"
    if os.environ.get("BENCH_MULTI", "1") != "0":
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
        try:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "bench_multichip.py")],
                env=env, capture_output=True, text=True, timeout=1800)
            multi_note = "ok" if r.returncode == 0 else f"rc={r.returncode}"
            if r.returncode != 0:
                sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        except Exception as e:  # pragma: no cover
            multi_note = f"error: {e}"

    result = {
        "metric": "nmpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 25.0, 2),
        "batch": batch,
        "spread_pct": round(spread_pct, 1),
        "single_solve_latency_ms": round(lat_ms, 2),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "mean_cost": round(float(np.mean(np.asarray(cost))), 2),
        "qp_iters_mean": round(qp_iters_mean, 2),
        "max_du_vs_cpu": max_du,
        "parity_gate_1e-3": "pass" if max_du <= 1.0e-3 else "FAIL",
        "converged_cost": round(cost_tpu_conv, 2),
        "cost_anchor_ratio": anchor_ratio,
        "cost_anchor_gate": anchor_gate,
        "parity_sweep_max_du": sweep_max,
        "parity_sweep": sweep_note,
        "bench_multi": multi_note,
    }
    print(json.dumps(result))
    if max_du > 1.0e-3 or anchor_gate == "FAIL" or sweep_note == "FAIL":
        sys.exit(1)


if __name__ == "__main__":
    main()
