"""Time lingram_lane_major alone (the dominant RTI-step kernel)."""
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
    Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, batch)

    from iterative_learning_nmpc_tpu.ops.dynjac_kernel import (
        lingram_lane_major)

    spec, w = solver.spec, solver.weights
    inc = solver.opt.torque_limit_in_qp

    jf = jax.jit(lambda X, U, p: lingram_lane_major(
        spec, w, X, U, p, include_torque=inc))
    t0 = time.perf_counter()
    out = jf(Xb, Ub, pb)
    _ = float(jnp.sum(out[0]))
    print(f"lingram compile: {time.perf_counter() - t0:.1f}s")
    for rep in range(3):
        t = timeit(jf, Xb, Ub, pb)
        print(f"B={batch}: lingram {t:7.2f} ms")


if __name__ == "__main__":
    main()
