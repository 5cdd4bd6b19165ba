"""A/B the fused lingram->Riccati chain vs the split path on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship
from _timing import timeit
from profile_lin import batch_inputs


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    solver, X, U, params = _flagship()
    warm = jax.jit(lambda X, U, p: solver.solve(X, U, p, 15))
    sol = warm(X, U, params)
    _ = float(jnp.sum(sol.X))
    Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, batch)

    from iterative_learning_nmpc_tpu.ops.dynjac_kernel import (
        lingram_lane_major)
    from iterative_learning_nmpc_tpu.ops.riccati_kernel import (
        riccati_pallas_lane_major)
    from iterative_learning_nmpc_tpu.solver.sqp import (
        _linearize_terminal, _riccati_solve_structured)
    from iterative_learning_nmpc_tpu.solver.linearize import lingram_structured
    from iterative_learning_nmpc_tpu.ocp.problem import NX

    spec, w = solver.spec, solver.weights
    inc = solver.opt.torque_limit_in_qp
    h, lm = solver.dt_nodes, float(solver.opt.lm_reg)

    def terminal(X, U, p):
        rT, JT = _linearize_terminal(spec, w, X[-1], p)
        return (JT.T @ JT + solver.cost.reg_eps_e * jnp.eye(NX, dtype=X.dtype),
                JT.T @ rT)

    P_N, p_N = jax.jit(jax.vmap(terminal))(Xb, Ub, pb)
    defects = jax.jit(jax.vmap(solver._defects))(Xb, Ub, pb)

    # fused chain
    def fused(X, U, p, P_N, p_N, defects):
        Qt, Rt, MTt, qxt, rut = lingram_lane_major(
            spec, w, X, U, p, include_torque=inc)
        return riccati_pallas_lane_major(
            h, lm, Qt, Rt, MTt, qxt, rut, defects, P_N, p_N)

    jf = jax.jit(fused)
    t0 = time.perf_counter()
    K1, k1 = jf(Xb, Ub, pb, P_N, p_N, defects)
    _ = float(jnp.sum(K1))
    print(f"fused compile: {time.perf_counter() - t0:.1f}s")
    t_f = timeit(jf, Xb, Ub, pb, P_N, p_N, defects)

    # split path (current production)
    from iterative_learning_nmpc_tpu.ops.riccati_kernel import (
        riccati_pallas_batched)

    def split(X, U, p, P_N, p_N, defects):
        Q, R, M, qx, ru = lingram_structured(spec, w, X, U, p,
                                             include_torque=inc)
        return riccati_pallas_batched(h, lm, Q, R, M, qx, ru, P_N, p_N,
                                      defects)

    js = jax.jit(split)
    K0, k0 = js(Xb, Ub, pb, P_N, p_N, defects)
    _ = float(jnp.sum(K0))
    t_s = timeit(js, Xb, Ub, pb, P_N, p_N, defects)

    err = float(jnp.max(jnp.abs(K1 - K0))) / max(float(jnp.max(jnp.abs(K0))), 1.0)
    print(f"B={batch}: fused {t_f:7.2f} ms | split {t_s:7.2f} ms | "
          f"rel K diff {err:.2e}")

    # full RTI step through the solver (fused path wired via _get_fused_lr)
    full = jax.jit(lambda X, U, p: jax.vmap(
        lambda x, u, pp: solver.solve(x, u, pp, 1))(X, U, p).X)
    out = full(Xb, Ub, pb)
    _ = float(jnp.sum(out))
    t_rti = timeit(full, Xb, Ub, pb)
    print(f"B={batch}: full RTI {t_rti:7.2f} ms -> "
          f"{batch / t_rti * 1e3:8.0f} solves/s")


if __name__ == "__main__":
    main()
