"""Validate riccati_rollout_lane_major (in-kernel rollout) vs the XLA path,
then time the full RTI step. Compares the vmapped fused chain's (dX1, dU1)
against the per-sample structured XLA primal of the same custom_vmap."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship
from _timing import timeit
from profile_lin import batch_inputs


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    solver, X, U, params = _flagship()
    warm = jax.jit(lambda X, U, p: solver.solve(X, U, p, 15))
    sol = warm(X, U, params)
    _ = float(jnp.sum(sol.X))

    # small-batch numeric check
    Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, 4)
    defects = jax.jit(jax.vmap(solver._defects))(Xb, Ub, pb)
    dx0 = pb.x0 - Xb[:, 0]
    f = solver._get_fused_lr()
    fused = jax.jit(lambda X, U, p, d, x0: jax.vmap(f)(X, U, p, d, x0))
    dX1, dU1 = fused(Xb, Ub, pb, defects, dx0)
    one = jax.jit(f)
    errs = []
    for b in range(4):
        pb1 = jax.tree.map(lambda x: x[b], pb)
        dX0, dU0 = one(Xb[b], Ub[b], pb1, defects[b], dx0[b])
        scale = max(float(jnp.max(jnp.abs(dU0))), 1.0)
        errs.append(max(float(jnp.max(jnp.abs(dX1[b] - dX0))),
                        float(jnp.max(jnp.abs(dU1[b] - dU0)))) / scale)
    print(f"rel step diff (fused rollout vs XLA), 4 samples: "
          f"{max(errs):.2e}")
    assert max(errs) < 5e-3, errs

    # full RTI timing
    Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, batch)
    full = jax.jit(lambda X, U, p: jax.vmap(
        lambda x, u, pp: solver.solve(x, u, pp, 1))(X, U, p).X)
    t0 = time.perf_counter()
    out = full(Xb, Ub, pb)
    _ = float(jnp.sum(out))
    print(f"full RTI compile: {time.perf_counter() - t0:.1f}s")
    for _rep in range(2):
        t = timeit(full, Xb, Ub, pb)
        print(f"B={batch}: full RTI {t:7.2f} ms -> "
              f"{batch / t * 1e3:8.0f} solves/s")


if __name__ == "__main__":
    main()
