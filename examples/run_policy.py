"""Learned-policy rollout CLI (reference `test_policy_rollout.py`).

    python examples/run_policy.py --policy ./policies/policy_bc_final.pkl \
        --vx 0.3 --sim_time 5
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", required=True)
    ap.add_argument("--robot", default="go2")
    ap.add_argument("--vx", type=float, default=0.3)
    ap.add_argument("--vy", type=float, default=0.0)
    ap.add_argument("--sim_time", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--combined", action="store_true",
                    help="policy + MPC safety fallback (SafeDAgger controller)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from run_mpc import get_spec

    from iterative_learning_nmpc_tpu.learning.rollouts import (
        rollout_combined,
        rollout_policy,
    )

    spec = get_spec(args.robot)
    v_des = np.array([args.vx, args.vy, 0.0])
    if args.combined:
        out = rollout_combined(spec, args.policy, sim_time=args.sim_time, v_des=v_des)
        is_exp = np.asarray(out.recorder.data["is_expert"])
        print(out.sim)
        print(f"expert-influence ratio: {is_exp.mean():.3f}")
    else:
        out = rollout_policy(spec, args.policy, sim_time=args.sim_time, v_des=v_des)
        print(out.sim)
    sys.exit(1 if out.sim.fell else 0)


if __name__ == "__main__":
    main()
