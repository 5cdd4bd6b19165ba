"""Polish loop: single DAgger iterations interleaved across the four goals
with a pure-MuJoCo 4-goal screen after EVERY retrain; keeps the checkpoint
with the most goals passed (ties: latest). Checkpoint selection on the
oracle plant is the reference's own protocol (`DAgger/test/
test_policy_rollout.py:41-55` logs which checkpoints survive how long);
round-4 screening showed per-goal transfer is near-threshold and tips with
each retrain, so the search is over iterates, not a single final.

    python scripts/exp_polish.py --init_policy ... --init_dataset ... \
        --out .expr/polish --rounds 16
"""
import argparse
import json
import os
import shutil
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOALS = (0.0, -0.15, 0.3, 0.15)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--init_policy", required=True)
    ap.add_argument("--init_dataset", required=True)
    ap.add_argument("--out", default="/root/repo/.expr/polish")
    ap.add_argument("--rounds", type=int, default=16,
                    help="total single-goal DAgger iterations (cycled)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sim_time", type=float, default=4.0)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--eval_secs", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--wide", action="store_true",
                    help="widened payload/terrain randomization ranges")
    ap.add_argument("--target", type=int, default=4,
                    help="stop once a checkpoint passes this many goals")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import numpy as np

    from iterative_learning_nmpc_tpu.learning.dagger import (
        OnDeviceSafeDagger,
        SafeDaggerConfig,
    )
    from iterative_learning_nmpc_tpu.learning.policy_controller import (
        PolicyController,
    )
    from iterative_learning_nmpc_tpu.robots.go2 import go2_spec
    from iterative_learning_nmpc_tpu.sim.mujoco_sim import Simulator

    spec = go2_spec()
    os.makedirs(args.out, exist_ok=True)

    def screen(path, tag):
        res = {}
        for g in GOALS:
            sim = Simulator(spec)
            pol = PolicyController(sim, path, v_des=np.array([g, 0.0, 0.0]))
            r = sim.run(sim_time=args.eval_secs, controller=pol)
            x = float(sim.data.qpos[0])
            ok = (not r.fell) and r.sim_time >= args.eval_secs - 1e-6
            if g != 0.0:
                ok = ok and (np.sign(x) == np.sign(g)
                             and abs(x) >= 0.4 * abs(g) * args.eval_secs)
            else:
                ok = ok and abs(x) < 0.5
            res[g] = dict(t=round(r.sim_time, 2), x=round(x, 2), ok=bool(ok))
        n_ok = sum(1 for g in GOALS if res[g]["ok"])
        print(f"[screen {tag}] {n_ok}/4 " + " ".join(
            f"{g:+.2f}:{'OK' if res[g]['ok'] else '--'}"
            f"(t={res[g]['t']},x={res[g]['x']:+.2f})" for g in GOALS),
            flush=True)
        return n_ok, res

    cfg = SafeDaggerConfig(
        record_dir=args.out, sim_time=args.sim_time, n_epochs=args.epochs,
        learning_rate=1e-3, batch_size=1024, mpc_min_steps=1000,
        goals=((0.0, 0.0, 0.0),),  # driven manually below
        n_iterations_per_goal=1, seed=args.seed,
        x0_z_noise=0.02, x0_rpy_noise=0.05, x0_vel_noise=0.10,
        unsafe_height_bounds=(0.24, 0.40),
    )
    pk = dict(mass_range=(0.0, 4.0), com_shift=0.04) if args.wide else {}
    tk = dict(height_range=(-0.03, 0.03), stiffness_range=(0.8e4, 5.0e4),
              friction_range=(0.4, 1.1)) if args.wide else {}
    pipe = OnDeviceSafeDagger(
        spec, cfg, initial_policy=args.init_policy,
        initial_dataset=args.init_dataset, batch=args.batch,
        randomize=True, payload_kwargs=pk, terrain_kwargs=tk)

    history = {}
    best_n, best_path = screen(args.init_policy, "init")[0], args.init_policy
    for it in range(args.rounds):
        g = GOALS[it % len(GOALS)]
        tag = f"it{it:02d}_vx{g:+.2f}"
        t0 = time.time()
        pipe.dataset_path = pipe.collect(
            pipe.policy_path, (g, 0.0, 0.0), pipe.dataset_path, tag)
        pipe.policy_path = pipe.run_training(pipe.dataset_path, tag)
        n_ok, res = screen(pipe.policy_path, tag)
        history[tag] = dict(n_ok=n_ok, res={str(k): v for k, v in res.items()},
                            policy=pipe.policy_path,
                            wall=round(time.time() - t0, 1))
        with open(os.path.join(args.out, "history.json"), "w") as f:
            json.dump(history, f, indent=1)
        if n_ok >= best_n:
            best_n, best_path = n_ok, pipe.policy_path
            shutil.copy(best_path, os.path.join(args.out, "policy_best.pkl"))
            print(f"[best] {best_n}/4 -> {best_path}", flush=True)
        if n_ok >= args.target:
            print(f"[done] target reached at {tag}", flush=True)
            break
    print(f"best: {best_n}/4 {best_path}", flush=True)


if __name__ == "__main__":
    main()
