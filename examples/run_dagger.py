"""LocoSafeDAgger outer loop CLI (reference `DAgger/example/iter_locosafedagger.py`).

    python examples/run_dagger.py --policy ./policies/policy_bc_final.pkl \
        --record_dir ./dagger --iters 4 --sim_time 10
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", required=True, help="initial (pretrained) policy")
    ap.add_argument("--dataset", default=None, help="initial dataset to aggregate onto")
    ap.add_argument("--robot", default="go2")
    ap.add_argument("--record_dir", default="./dagger")
    ap.add_argument("--sim_time", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--goals", default="0.15,0,0;0,0,0;-0.15,0,0")
    ap.add_argument("--config", default=None,
                    help="YAML SafeDaggerConfig file (overrides tuning flags)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="KEY=VALUE", help="config override (repeatable)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from run_mpc import get_spec

    from iterative_learning_nmpc_tpu.learning.dagger import (
        SafeDaggerConfig,
        SafeDaggerPipeline,
    )

    spec = get_spec(args.robot)
    from iterative_learning_nmpc_tpu.utils.config_io import load_config, save_config

    if args.config or args.overrides:
        cfg = load_config(SafeDaggerConfig, args.config, overrides=args.overrides)
    else:
        goals = [tuple(float(x) for x in g.split(",")) for g in args.goals.split(";")]
        cfg = SafeDaggerConfig(
            record_dir=args.record_dir,
            sim_time=args.sim_time,
            n_epochs=args.epochs,
            goals=goals,
            n_iterations_per_goal=args.iters,
        )
    save_config(cfg, os.path.join(cfg.record_dir, "config.yaml"))
    pipeline = SafeDaggerPipeline(spec, cfg, initial_policy=args.policy,
                                  initial_dataset=args.dataset)
    final = pipeline.run()
    print("final policy:", final)
    print("expert ratios:", [round(r, 3) for r in pipeline.collector.expert_ratio_history])


if __name__ == "__main__":
    main()
