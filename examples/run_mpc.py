"""CLI driver — the reference `main.py` equivalent.

    python examples/run_mpc.py --mode close_loop --robot go2 --gait trot \
        --vx 0.3 --sim_time 5.0

Modes (reference `main.py:205-223`):
  traj_opt   one trajectory-optimization solve, prints the solution summary
  open_loop  MPC-in-a-loop without a simulator (integrates its own plan)
  close_loop closed-loop MuJoCo simulation at 1 kHz with async replanning
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_spec(robot: str, urdf: str = None):
    """Catalog lookup; `urdf` switches to description-file ingestion
    (robots/urdf.py — the reference's get_robot_description role)."""
    if robot.lower() == "go2":
        from iterative_learning_nmpc_tpu.robots.go2 import go2_spec

        return go2_spec(urdf_path=urdf)
    if robot.lower() == "solo12":
        from iterative_learning_nmpc_tpu.robots.solo12 import solo12_spec

        return solo12_spec(urdf_path=urdf)
    if urdf:
        from iterative_learning_nmpc_tpu.robots.urdf import parse_urdf

        return parse_urdf(urdf, name=robot)
    raise SystemExit(f"unknown robot {robot} (pass --urdf for new robots)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="close_loop",
                    choices=["traj_opt", "open_loop", "close_loop"])
    ap.add_argument("--robot", default="go2")
    ap.add_argument("--urdf", default=None,
                    help="ingest this URDF description instead of the "
                         "built-in parameter table (robots/urdf.py)")
    ap.add_argument("--gait", default="trot")
    ap.add_argument("--vx", type=float, default=0.3)
    ap.add_argument("--vy", type=float, default=0.0)
    ap.add_argument("--wz", type=float, default=0.0)
    ap.add_argument("--sim_time", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--contact_planner", default="", help="'', raibert, custom")
    ap.add_argument("--interactive", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from iterative_learning_nmpc_tpu.mpc.controller import LocomotionMPC
    from iterative_learning_nmpc_tpu.models import transforms_np as tnp

    spec = get_spec(args.robot, args.urdf)
    mpc = LocomotionMPC(
        spec,
        gait_name=args.gait,
        contact_planner=args.contact_planner,
        interactive_goal=args.interactive,
        print_info=True,
        solve_async=(args.mode == "close_loop"),
    )
    mpc.set_command(np.array([args.vx, args.vy, 0.0]), args.wz)

    if args.mode == "traj_opt":
        q0 = np.asarray(spec.q_home, dtype=np.float64)
        v0 = np.zeros(spec.nv)
        q_plan, v_plan, a_plan, f_plan, tau_ff = mpc.optimize(q0, v0)
        print("plan shapes:", q_plan.shape, v_plan.shape, f_plan.shape)
        print("base z range:", q_plan[:, 2].min().round(3), q_plan[:, 2].max().round(3))
        print("|tau_ff| max:", np.abs(tau_ff).max().round(2))
        return

    if args.mode == "open_loop":
        q0 = np.asarray(spec.q_home, dtype=np.float64)
        q_mj, v_mj = tnp.convert_to_mujoco(q0, np.zeros(spec.nv))
        traj = mpc.open_loop(q_mj, v_mj, args.sim_time)
        print("open-loop trajectory:", traj.shape)
        print("final base:", traj[-1, :7].round(3))
        mpc.print_timings()
        return

    from iterative_learning_nmpc_tpu.sim.mujoco_sim import Simulator

    sim = Simulator(spec)
    res = sim.run(sim_time=args.sim_time, controller=mpc)
    print(res)
    print("final base:", sim.data.qpos[:7].round(3))
    print(f"mean vx: {sim.data.qpos[0] / max(res.sim_time, 1e-6):.3f} (cmd {args.vx})")
    mpc.print_timings()
    sys.exit(1 if (res.fell or res.diverged) else 0)


if __name__ == "__main__":
    main()
