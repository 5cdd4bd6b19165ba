"""A/B the fused Riccati kernel variants (fori_loop vs unrolled) on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.ops.riccati_kernel import riccati_pallas_batched


from _timing import timeit  # noqa: E402  (end-fenced: tunnel-safe)


def main():
    B, N, nx, nu = 256, 25, 36, 30
    rng = np.random.RandomState(0)
    mk = lambda *s: rng.randn(*s).astype(np.float32)
    Jq = mk(B, N, 50, nx)
    Jr = mk(B, N, 50, nu)
    Q = np.einsum("bnri,bnrj->bnij", Jq, Jq) + 1e-3 * np.eye(nx, dtype=np.float32)
    R = np.einsum("bnri,bnrj->bnij", Jr, Jr) + np.eye(nu, dtype=np.float32)
    M = 0.1 * np.einsum("bnri,bnrj->bnij", Jq, Jr)
    qx, ru = mk(B, N, nx), mk(B, N, nu)
    PT = mk(B, 60, nx)
    P_N = np.einsum("bri,brj->bij", PT, PT) + np.eye(nx, dtype=np.float32)
    p_N = mk(B, nx)
    d = 0.01 * mk(B, N, nx)
    args = tuple(map(jnp.asarray, (Q, R, M, qx, ru, P_N, p_N, d)))

    for unrolled in (False, True):
        fn = jax.jit(lambda *a, u=unrolled: riccati_pallas_batched(
            0.04, 1e-6, *a, unrolled=u))
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t = timeit(fn, *args)
        print(f"unrolled={unrolled}: {t:7.2f} ms  (compile {compile_s:.1f}s)")
        if unrolled:
            K1, k1 = out
        else:
            K0, k0 = out
    err = float(jnp.max(jnp.abs(K1 - K0))) / float(jnp.max(jnp.abs(K0)))
    print(f"rel max diff K: {err:.2e}")


if __name__ == "__main__":
    main()
