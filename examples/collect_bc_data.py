"""BC data collection CLI (force-perturbation flavor).

Reference counterpart: `Behavior_Cloning/utils/Rollout_MPC.py` +
`data_collection_force_perturbation.py` hydra entry points.

    python examples/collect_bc_data.py --record_dir ./data --vx 0.3 \
        --sim_time_nominal 2.0 --n_perturb 3
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="go2")
    ap.add_argument("--gait", default="trot")
    ap.add_argument("--record_dir", default="./data")
    ap.add_argument("--vx", type=float, default=0.3)
    ap.add_argument("--vy", type=float, default=0.0)
    ap.add_argument("--sim_time_nominal", type=float, default=2.0)
    ap.add_argument("--sim_time_perturbed", type=float, default=1.5)
    ap.add_argument("--n_perturb", type=int, default=10)
    ap.add_argument("--replan_grid", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pretrain", action="store_true",
                    help="multi-goal omni-directional collection")
    ap.add_argument("--n_goals", type=int, default=5)
    ap.add_argument("--config", default=None,
                    help="YAML DataCollectionConfig/PretrainConfig file "
                         "(overrides tuning flags)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="KEY=VALUE", help="config override (repeatable)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from run_mpc import get_spec

    from iterative_learning_nmpc_tpu.learning.datagen import (
        DataCollection,
        DataCollectionConfig,
        PretrainConfig,
        PretrainDataCollection,
    )

    spec = get_spec(args.robot)
    common = dict(
        record_dir=args.record_dir,
        sim_time_nominal=args.sim_time_nominal,
        sim_time_perturbed=args.sim_time_perturbed,
        v_des=(args.vx, args.vy, 0.0),
        gait_name=args.gait,
        replan_freq_steps=args.replan_grid,
        num_perturbations_per_replanning=args.n_perturb,
        seed=args.seed,
    )
    from iterative_learning_nmpc_tpu.utils.config_io import load_config, save_config

    if args.config or args.overrides:
        cls = PretrainConfig if args.pretrain else DataCollectionConfig
        cfg = load_config(cls, args.config, overrides=args.overrides)
    elif args.pretrain:
        cfg = PretrainConfig(n_goals=args.n_goals, **common)
    else:
        cfg = DataCollectionConfig(**common)
    save_config(cfg, os.path.join(cfg.record_dir, "config.yaml"))
    dc = (PretrainDataCollection if args.pretrain else DataCollection)(spec, cfg)
    out = dc.run()
    print("dataset written:", out)


if __name__ == "__main__":
    main()
