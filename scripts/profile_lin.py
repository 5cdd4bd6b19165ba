"""Breakdown inside the linearize+Gram stage + batch-size scaling sweep."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship


from _timing import timeit  # noqa: E402  (end-fenced: tunnel-safe)


def batch_inputs(solver, X, U, params, sol, batch):
    key = jax.random.PRNGKey(0)
    noise = 0.01 * jax.random.normal(key, (batch, X.shape[-1]))
    pb = jax.tree.map(lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), params)
    pb = pb.__class__(**{**{f: getattr(pb, f) for f in pb.__dataclass_fields__},
                         "x0": pb.x0 + noise})
    Xb = jnp.tile(sol.X[None], (batch, 1, 1)).at[:, 0].set(pb.x0)
    Ub = jnp.tile(sol.U[None], (batch, 1, 1))
    return Xb, Ub, pb


def main():
    solver, X, U, params = _flagship()
    warm = jax.jit(lambda X, U, p: solver.solve(X, U, p, 15))
    sol = warm(X, U, params)
    jax.block_until_ready(sol.X)

    from iterative_learning_nmpc_tpu.solver.linearize import (
        linearize_stages_dynjac, lingram_stages_dynjac, lingram_structured)
    from iterative_learning_nmpc_tpu.ops.dynjac_kernel import dynjac_pallas
    from iterative_learning_nmpc_tpu.ocp.problem import NX

    spec, w = solver.spec, solver.weights
    Jxc, Juc = solver._jac_const
    inc = solver.opt.torque_limit_in_qp

    Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, 256)

    jit_lin = jax.jit(lambda X, U, p: linearize_stages_dynjac(
        spec, w, X, U, p, Jxc, Juc, include_torque=inc))
    jit_lingram = jax.jit(lambda X, U, p: lingram_stages_dynjac(
        spec, w, X, U, p, Jxc, Juc, include_torque=inc))

    def dynjac_only(Xb, Ub, pb):
        B, N = Ub.shape[0], Ub.shape[1]
        X_nodes = Xb[:, :-1].reshape(B * N, NX)
        A_nodes = Ub[..., :18].reshape(B * N, 18)
        cnt_n = jnp.swapaxes(pb.cnt[:, :, :N], 1, 2)
        f_n = Ub[..., 18:30].reshape(B, N, 4, 3)
        fe_nodes = (cnt_n[..., None] * f_n).reshape(B * N, 12)
        return dynjac_pallas(spec, X_nodes, A_nodes, fe_nodes)

    jit_dynjac = jax.jit(dynjac_only)

    jit_structured = jax.jit(lambda X, U, p: lingram_structured(
        spec, w, X, U, p, include_torque=inc))

    t_lin = timeit(jit_lin, Xb, Ub, pb)
    t_lingram = timeit(jit_lingram, Xb, Ub, pb)
    t_struct = timeit(jit_structured, Xb, Ub, pb)
    t_dj = timeit(jit_dynjac, Xb, Ub, pb)
    print(f"B=256: dynjac kernel only : {t_dj:7.2f} ms")
    print(f"B=256: +assembly (r,Jx,Ju): {t_lin:7.2f} ms")
    print(f"B=256: +Gram (lingram)    : {t_lingram:7.2f} ms")
    print(f"B=256: structured Gram    : {t_struct:7.2f} ms")

    # batch scaling of the full RTI step
    for B in (128, 256, 512, 1024):
        Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, B)
        full = jax.jit(lambda X, U, p: jax.vmap(
            lambda x, u, pp: solver.solve(x, u, pp, 1))(X, U, p).X)
        t = timeit(full, Xb, Ub, pb, reps=10)
        print(f"B={B:5d}: RTI {t:7.2f} ms  -> {B / t * 1e3:8.0f} solves/s")


if __name__ == "__main__":
    main()
