"""Benchmark: NMPC solves/s on the real TPU chip.

Prints ONE JSON line:
  {"metric": "nmpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 25.0, ...extras}

Baseline: the reference's implied real-time budget is 25 solves/s
(40 ms per async solve at 25 Hz replanning — BASELINE.md). The north-star
target is >= 1000 full-horizon solves/s per chip (BASELINE.json).

Regime measured: steady-state RTI (1 SQP iteration, warm-started), batch of
perturbed Go2 trot instances at the reference's OCP size (N=25 nodes, 1 s
horizon) — the configuration the controller runs in closed loop.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

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

    # Steady-state throughput: `reps` warm-started RTI steps chained inside
    # ONE jit via lax.scan — each step re-solves from the previous solution,
    # exactly how the solver runs inside on-device datagen / closed-loop
    # programs (learning/ondevice.py). Keeping the loop on-device excludes
    # the axon-tunnel dispatch gap (~2 ms/call here, ~100 us on a local
    # chip) that a per-call loop would charge to the solver.
    @jax.jit
    def rti_scan(X, U, p):
        def step(carry, _):
            X, U = carry
            s = jax.vmap(lambda x, u, pp: solver.solve(x, u, pp, 1))(X, U, p)
            return (s.X, s.U), s.stats.cost
        (X, U), costs = jax.lax.scan(step, (X, U), None, length=reps)
        return X, U, costs[-1]

    t0 = time.perf_counter()
    out = rti_scan(Xb, Ub, pb)
    _ = float(jnp.sum(out[0][:, 0, 0]))
    compile_s = time.perf_counter() - t0

    # timed steady-state loop (optionally under the JAX profiler:
    # BENCH_PROFILE=/tmp/nmpc_trace writes a TensorBoard trace there)
    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    # NOTE: block_until_ready over the axon tunnel can return before device
    # execution completes; a scalar device->host readback is the only
    # reliable fence.
    t0 = time.perf_counter()
    Xb2, Ub2, cost = rti_scan(Xb, Ub, pb)
    _ = float(jnp.sum(Xb2[:, 0, 0]))
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
    solves_per_s = batch * reps / dt


    # single-solve latency (batch=1) — the per-step real-time budget check.
    # Chained on-device (scan) so the number is device latency, not the
    # axon-tunnel round trip (~5-10 ms) a per-call loop would measure.
    @jax.jit
    def rti_one_scan(X, U, p):
        def step(carry, _):
            s = solver.solve(carry[0], carry[1], p, 1)
            return (s.X, s.U), None
        (X, U), _ = jax.lax.scan(step, (X, U), None, length=reps)
        return X, U

    x1 = jax.tree.map(lambda x: x[0], pb)
    o = rti_one_scan(Xb[0], Ub[0], x1)
    _ = float(jnp.sum(o[0][0]))
    t0 = time.perf_counter()
    o = rti_one_scan(Xb[0], Ub[0], x1)
    _ = float(jnp.sum(o[0][0]))
    lat_ms = (time.perf_counter() - t0) / reps * 1e3

    result = {
        "metric": "nmpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 25.0, 2),
        "batch": batch,
        "single_solve_latency_ms": round(lat_ms, 2),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "mean_cost": round(float(np.mean(np.asarray(cost))), 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
