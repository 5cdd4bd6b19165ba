"""Measure policy warm starts vs cold inits on the TPU -> BENCH_WARMSTART.json.

BASELINE.json north star: "learned-policy warm-starts feed back into the
solver to cut iterations". Uses the SHIPPED artifact
(assets/policy_go2_trot_ondevice_dagger.pkl) on three start states (home
stand, perturbed mid-gait, post-divergence recovery), three inits:

- naive:  x0-replicated states + zero inputs (acados-style cold start)
- cold:   solver.cold_start (engineered stationary stance + gravity shares)
- policy: solver/warmstart.policy_warmstart (device-plant policy rollout)

Reports iterations-to-nlp_tol (SolveStats.sqp_iters), final GN cost, and
the wall latency of the full cold-boot path (init + 15-iteration solve).

    python scripts/bench_warmstart.py [--cpu] [--out BENCH_WARMSTART.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_WARMSTART.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from iterative_learning_nmpc_tpu.gait.planner import ContactPlanner
    from iterative_learning_nmpc_tpu.learning.network import load_policy
    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
    from iterative_learning_nmpc_tpu.robots.go2 import go2_spec
    from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params
    from iterative_learning_nmpc_tpu.solver.warmstart import policy_warmstart

    spec = go2_spec()
    gait, opt, cost = get_quadruped_config("trot", "go2")
    solver = TrajOptSolver(spec, opt, cost)
    N = solver.N
    planner = ContactPlanner(spec.feet_frame_names, solver.dt_nodes, gait)

    net, variables, norm = load_policy(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "policy_go2_trot_ondevice_dagger.pkl"))
    mu_s, sd_s, mu_g, sd_g = [np.asarray(x, np.float32) for x in norm]
    sd_s = np.where(sd_s > 1e-8, sd_s, 1.0)

    def apply_fn(x):
        s, g = x[:44], x[44:]
        s = s.at[1:].set((s[1:] - mu_s[1:]) / sd_s[1:])
        g = (g - mu_g) / sd_g
        return net.apply(variables, jnp.concatenate([s, g])[None],
                         train=False)[0]

    q0 = np.asarray(spec.q_home, np.float32).copy()
    p0 = np.asarray(jax.jit(lambda q: dyn.foot_positions(spec, q))(q0))
    q0[2] += -p0[0, 2] + float(np.asarray(spec.foot_radius))
    v_des = np.array([0.3, 0.0, 0.0], np.float32)

    states = {"home": np.concatenate([q0, np.zeros(18, np.float32)])}
    qs = q0.copy()
    qs[2] -= 0.02
    qs[6:18] += np.random.default_rng(1).normal(0, 0.05, 12).astype(np.float32)
    vs = np.zeros(18, np.float32)
    vs[0] = 0.3
    states["midgait"] = np.concatenate([qs, vs])
    qr = q0.copy()
    qr[2] -= 0.06
    qr[4] = 0.15
    qr[5] = -0.1
    vr = np.zeros(18, np.float32)
    vr[[0, 1, 2]] = (0.1, -0.2, -0.3)
    states["recovery"] = np.concatenate([qr, vr])

    solve = jax.jit(lambda X, U, p, n: solver.solve(X, U, p, n),
                    static_argnums=3)
    cold = jax.jit(solver.cold_start)
    ws = jax.jit(lambda p: policy_warmstart(solver, apply_fn, p, v_des))

    # fused cold-boot paths for latency (ONE device call each)
    @jax.jit
    def boot_cold(p):
        X, U = solver.cold_start(p)
        return solver.solve(X, U, p, 15).X

    @jax.jit
    def boot_policy(p):
        X, U = policy_warmstart(solver, apply_fn, p, v_des)
        return solver.solve(X, U, p, 15).X

    def timeit(fn, p):
        jax.block_until_ready(fn(p))  # compile
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            jax.block_until_ready(fn(p))
        return (time.perf_counter() - t0) / args.repeats * 1e3

    table = {}
    for name, x0 in states.items():
        cnt = planner.get_contacts(0, N + 1)
        base_ref = np.zeros(12, np.float32)
        base_ref[:3] = x0[:3]
        base_ref[2] = gait.nom_height
        base_ref[6] = v_des[0]
        p = make_params(solver, x0, cnt, base_ref=base_ref,
                        step_height=gait.step_height)
        Xn = jnp.tile(jnp.asarray(x0)[None], (N + 1, 1))
        Un = jnp.zeros((N, 30), jnp.float32)
        sn = solve(Xn, Un, p, 15)
        Xc, Uc = cold(p)
        sc = solve(Xc, Uc, p, 15)
        Xw, Uw = ws(p)
        sw = solve(Xw, Uw, p, 15)
        table[name] = {
            "naive": {"iters": int(sn.stats.sqp_iters),
                      "cost": round(float(sn.stats.cost), 2)},
            "cold": {"iters": int(sc.stats.sqp_iters),
                     "cost": round(float(sc.stats.cost), 2)},
            "policy": {"iters": int(sw.stats.sqp_iters),
                       "cost": round(float(sw.stats.cost), 2)},
            "boot_latency_ms": {
                "cold": round(timeit(boot_cold, p), 3),
                "policy": round(timeit(boot_policy, p), 3),
            },
        }
        print(name, json.dumps(table[name]), flush=True)

    out = {
        "what": ("policy warm start (shipped DAgger artifact, device-plant "
                 "rollout) vs engineered cold_start vs acados-style naive "
                 "init; iterations to nlp_tol + 15-iter cold-boot latency"),
        "hardware": jax.devices()[0].device_kind,
        "artifact": "assets/policy_go2_trot_ondevice_dagger.pkl",
        "nlp_tol": float(opt.nlp_tol),
        "repeats": args.repeats,
        "states": table,
        "date": time.strftime("%Y-%m-%d"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
