"""Compare lingram_lane_major (Pallas, compiled Mosaic) block-by-block
against linearize.lingram_structured (XLA) on TPU, then time the kernel."""
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
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    solver, X, U, params = _flagship()
    warm = jax.jit(lambda X, U, p: solver.solve(X, U, p, 15))
    sol = warm(X, U, params)
    _ = float(jnp.sum(sol.X))

    from iterative_learning_nmpc_tpu.ops.dynjac_kernel import (
        lingram_lane_major)
    from iterative_learning_nmpc_tpu.solver.linearize import lingram_structured

    spec, w = solver.spec, solver.weights
    inc = solver.opt.torque_limit_in_qp

    # numeric check at small batch, with inactive AND active hinge duals
    Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, 4)
    key = jax.random.PRNGKey(1)
    lam_i = 0.5 * jax.random.uniform(key, pb.lam_ineq.shape)
    pb = pb.__class__(**{**{f: getattr(pb, f)
                            for f in pb.__dataclass_fields__},
                         "lam_ineq": lam_i.at[2:].set(0.0)})

    jf = jax.jit(lambda X, U, p: lingram_lane_major(
        spec, w, X, U, p, include_torque=inc))
    js = jax.jit(lambda X, U, p: lingram_structured(
        spec, w, X, U, p, include_torque=inc))
    Qt, Rt, MTt, qxt, rut = jf(Xb, Ub, pb)
    Q0, R0, M0, qx0, ru0 = js(Xb, Ub, pb)
    B, N = 4, Q0.shape[1]

    def unlane(x, r, c):                           # (N,r,c,Bp) -> (B,N,r,c)
        return jnp.moveaxis(x, -1, 0)[:B]

    pairs = [
        ("Q", unlane(Qt, 36, 36), Q0),
        ("R", unlane(Rt, 32, 32)[:, :, :30, :30], R0),
        ("MT", jnp.swapaxes(unlane(MTt, 32, 36)[:, :, :30], 2, 3), M0),
        ("qx", unlane(qxt, 36, 1)[..., 0], qx0),
        ("ru", unlane(rut, 32, 1)[:, :, :30, 0], ru0),
    ]
    for name, a, b in pairs:
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        err = float(jnp.max(jnp.abs(a - b))) / scale
        print(f"{name:3s} rel err {err:.2e}")
        assert err < 2e-4, (name, err)

    # timing at full batch
    Xb, Ub, pb = batch_inputs(solver, X, U, params, sol, batch)
    t0 = time.perf_counter()
    out = jf(Xb, Ub, pb)
    _ = float(jnp.sum(out[0]))
    print(f"compile: {time.perf_counter() - t0:.1f}s")
    for _rep in range(3):
        t = timeit(jf, Xb, Ub, pb)
        print(f"B={batch}: lingram {t:7.2f} ms")


if __name__ == "__main__":
    main()
