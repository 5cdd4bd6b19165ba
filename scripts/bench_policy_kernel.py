"""Fused policy kernel vs XLA-fused net.apply (VERDICT r2 weak-item 3).

Measures the policy-inference+PD hot path three ways at datagen batch sizes:

  a) ops/policy_kernel.make_fused_policy_pd (Pallas, VMEM-resident weights)
  b) jax.vmap(net.apply) + PD  (exactly how learning/ondevice.py's combined
     rollout computes the policy branch — the vmap axis becomes the matmul
     batch under XLA)
  c) net.apply on the full batch + PD (batch-major, what the serving path /
     solver/warmstart.py sees)

    python scripts/bench_policy_kernel.py [--cpu] [--batch 4096]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[512, 4096])
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from iterative_learning_nmpc_tpu.learning.network import init_network
    from iterative_learning_nmpc_tpu.ops.policy_kernel import (
        fold_batchnorm,
        make_fused_policy_pd,
    )

    net, variables = init_network(jax.random.PRNGKey(0), 47, 12,
                                  num_hidden_layer=3, hidden_dim=512)
    layers = fold_batchnorm(variables)
    kp, kd = 20.0, 1.5
    interp = jax.default_backend() == "cpu"
    fused = make_fused_policy_pd(layers, kp, kd, interpret=interp)

    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")

    def timeit(f, *xs):
        out = f(*xs)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out[1] if isinstance(out, tuple) else out))
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            for _j in range(args.reps):
                out = f(*xs)
            _ = float(jnp.sum(out[1] if isinstance(out, tuple) else out))
            ts.append((time.perf_counter() - t0) / args.reps)
        return float(np.median(ts)) * 1e6  # us

    for B in args.batch:
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (B, 47), jnp.float32)
        qj = jax.random.normal(key, (B, 12), jnp.float32)
        vj = jax.random.normal(key, (B, 12), jnp.float32)

        f_a = jax.jit(lambda x, q, v: fused(x, q, v))

        @jax.jit
        def f_b(x, q, v):
            def one(xi, qi, vi):
                a = net.apply(variables, xi[None], train=False)[0]
                return a, kp * (a - qi) - kd * vi
            return jax.vmap(one)(x, q, v)

        @jax.jit
        def f_c(x, q, v):
            a = net.apply(variables, x, train=False)
            return a, kp * (a - q) - kd * v

        t_a = timeit(f_a, x, qj, vj)
        t_b = timeit(f_b, x, qj, vj)
        t_c = timeit(f_c, x, qj, vj)
        # numerics agreement
        oa = f_a(x, qj, vj)
        ob = f_b(x, qj, vj)
        err = float(jnp.abs(oa[1] - ob[1]).max())
        print(f"B={B:5d}: pallas {t_a:8.1f} us | vmap(apply) {t_b:8.1f} us "
              f"| batch apply {t_c:8.1f} us | max|dtau| {err:.2e}")


if __name__ == "__main__":
    main()
