"""Per-stage breakdown of the batched RTI step on TPU.

Times each stage of solver._sqp_iter's fused path separately:
lingram kernel, fused Riccati+rollout kernel, merit/line-search, and the
AL dual-update evaluation. Stage sums should be close to the full-step
time from check_fused_rollout.py / bench.py.
"""
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

    defects = jax.jit(jax.vmap(solver._defects))(Xb, Ub, pb)
    dx0 = pb.x0 - Xb[:, 0]
    f = solver._get_fused_lr()
    fused = jax.jit(lambda X, U, p, d, x0: jax.vmap(f)(X, U, p, d, x0))
    dX1, dU1 = fused(Xb, Ub, pb, defects, dx0)
    _ = float(jnp.sum(dX1))

    stages = {}
    jl = jax.jit(lambda X, U, p: lingram_lane_major(
        spec, w, X, U, p, include_torque=inc))
    _ = float(jnp.sum(jl(Xb, Ub, pb)[0]))
    stages["lingram kernel"] = timeit(jl, Xb, Ub, pb)

    stages["lingram+riccati+rollout"] = timeit(fused, Xb, Ub, pb, defects,
                                               dx0)

    alphas = jnp.asarray(solver.opt.ls_alphas_steady)
    jm = jax.jit(lambda X, U, p, dX, dU, d: jax.vmap(
        lambda x, u, pp, a, b, dd: solver._merit_select(
            x, u, pp, a, b, dd, 1e2, alphas))(X, U, p, dX, dU, d)[0])
    _ = float(jnp.sum(jm(Xb, Ub, pb, dX1, dU1, defects)))
    stages["merit/line-search"] = timeit(jm, Xb, Ub, pb, dX1, dU1, defects)

    jd = jax.jit(lambda X, U, p: jax.vmap(solver._dual_g)(X, U, p)[1])
    _ = float(jnp.sum(jd(Xb, Ub, pb)))
    stages["dual-update eval"] = timeit(jd, Xb, Ub, pb)

    jdef = jax.jit(lambda X, U, p: jax.vmap(solver._defects)(X, U, p))
    _ = float(jnp.sum(jdef(Xb, Ub, pb)))
    stages["defects"] = timeit(jdef, Xb, Ub, pb)

    print(f"B={batch} stage breakdown:")
    for k, v in stages.items():
        print(f"  {k:26s} {v:7.2f} ms")
    rr = stages["lingram+riccati+rollout"] - stages["lingram kernel"]
    print(f"  {'(riccati+rollout alone)':26s} {rr:7.2f} ms")


if __name__ == "__main__":
    main()
