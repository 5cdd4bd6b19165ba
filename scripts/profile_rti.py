"""Ad-hoc stage breakdown of one batched RTI iteration on the TPU.

Times, at BENCH_BATCH problems: (a) the full rti step, (b) linearize+Gram
only, (c) Riccati only, (d) forward+merit line search only, so the next
kernel target is chosen from data, not guesswork. Not part of the test
suite; run manually: python scripts/profile_rti.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship


from _timing import timeit  # noqa: E402  (end-fenced: tunnel-safe)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    solver, X, U, params = _flagship()
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

    lingram = solver._get_lingram_dynjac()
    from iterative_learning_nmpc_tpu.ops.riccati_kernel import make_riccati_pallas
    from iterative_learning_nmpc_tpu.ocp.problem import NX
    from iterative_learning_nmpc_tpu.solver.sqp import (
        _forward_delta_structured, _linearize_terminal)

    riccati = make_riccati_pallas(solver.dt_nodes, solver.opt.lm_reg)
    spec, w, cost = solver.spec, solver.weights, solver.cost
    h = solver.dt_nodes
    alphas = jnp.asarray(solver.opt.ls_alphas_steady)

    def lin_stage(X, U, p):
        return lingram(X, U, p)

    def terminal_stage(X, U, p):
        rT, JT = _linearize_terminal(spec, w, X[-1], p)
        P_N = JT.T @ JT + cost.reg_eps_e * jnp.eye(NX, dtype=X.dtype)
        return P_N, JT.T @ rT

    def defects_stage(X, U, p):
        return solver._defects(X, U, p), p.x0 - X[0]

    def riccati_stage(Q, R, M, qx, ru, P_N, p_N, defects):
        return riccati(Q, R, M, qx, ru, P_N, p_N, defects)

    def forward_merit_stage(X, U, p, K, kff, defects, dx0):
        # mirrors sqp._line_search: one rollout at alpha=1, per-alpha merit
        dX1, dU1 = _forward_delta_structured(h, K, kff, defects, dx0, 1.0)

        def candidate(alpha):
            Xc, Uc = X + alpha * dX1, U + alpha * dU1
            cost_c = solver._total_cost(Xc, Uc, p)
            return cost_c + 1e2 * (1.0 - alpha) * jnp.sum(jnp.abs(defects))

        merits = jax.vmap(candidate)(alphas)
        best = jnp.argmin(merits)
        a = alphas[best]
        return X + a * dX1, U + a * dU1

    vm = lambda f: jax.jit(jax.vmap(f))
    full = jax.jit(lambda X, U, p: jax.vmap(
        lambda x, u, pp: solver.solve(x, u, pp, 1))(X, U, p).X)

    # precompute intermediate stage inputs
    Q, R, M, qx, ru = vm(lin_stage)(Xb, Ub, pb)
    P_N, p_N = vm(terminal_stage)(Xb, Ub, pb)
    defects, dx0 = vm(defects_stage)(Xb, Ub, pb)
    K, kff = vm(riccati_stage)(Q, R, M, qx, ru, P_N, p_N, defects)
    jax.block_until_ready(K)

    t_full = timeit(full, Xb, Ub, pb)
    t_lin = timeit(vm(lin_stage), Xb, Ub, pb)
    t_term = timeit(vm(terminal_stage), Xb, Ub, pb)
    t_def = timeit(vm(defects_stage), Xb, Ub, pb)
    t_ric = timeit(vm(riccati_stage), Q, R, M, qx, ru, P_N, p_N, defects)
    t_fwd = timeit(vm(forward_merit_stage), Xb, Ub, pb, K, kff, defects, dx0)

    print(f"batch={batch} backend={jax.default_backend()}")
    print(f"full RTI iter   : {t_full:8.2f} ms   ({batch / t_full * 1e3:8.0f} solves/s)")
    print(f"  linearize+Gram: {t_lin:8.2f} ms")
    print(f"  terminal      : {t_term:8.2f} ms")
    print(f"  defects       : {t_def:8.2f} ms")
    print(f"  riccati       : {t_ric:8.2f} ms")
    print(f"  forward+merit : {t_fwd:8.2f} ms")
    print(f"  sum stages    : {t_lin + t_term + t_def + t_ric + t_fwd:8.2f} ms")


if __name__ == "__main__":
    main()
