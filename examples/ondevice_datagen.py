"""Pod-scale on-device expert datagen CLI.

Runs B fully on-device closed-loop MPC rollouts (RTI replans inside the
scan), gathers the valid dataset rows to the host, and writes an HDF5
Database snapshot compatible with the BC trainer.

    python examples/ondevice_datagen.py --batch 256 --seconds 2.0 \
        --out ./data/ondevice_0.hdf5
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="go2")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--vx_max", type=float, default=0.3)
    ap.add_argument("--joint_noise", type=float, default=0.03)
    ap.add_argument("--out", default="./data/ondevice_0.hdf5")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--randomize", action="store_true",
                    help="per-env payload + terrain domain randomization")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from run_mpc import get_spec

    from iterative_learning_nmpc_tpu.learning.database import Database
    from iterative_learning_nmpc_tpu.learning.ondevice import make_batched_mpc_rollout
    from iterative_learning_nmpc_tpu.models import dynamics as dyn

    spec = get_spec(args.robot)
    q0 = np.asarray(spec.q_home, np.float32).copy()
    p0 = np.asarray(jax.jit(lambda q: dyn.foot_positions(spec, q))(q0))
    q0[2] += -p0[0, 2] + float(np.asarray(spec.foot_radius))
    x0 = np.concatenate([q0, np.zeros(18, np.float32)])

    rng = np.random.default_rng(args.seed)
    B = args.batch
    x0b = np.tile(x0[None], (B, 1))
    x0b[:, 6:18] += rng.normal(0, args.joint_noise, (B, 12)).astype(np.float32)
    vdes = np.zeros((B, 3), np.float32)
    vdes[:, 0] = rng.uniform(0.0, args.vx_max, B)

    n_intervals = int(round(args.seconds / 0.04))
    rollout = make_batched_mpc_rollout(spec, n_intervals=n_intervals)
    ps = tr = None
    if args.randomize:
        from iterative_learning_nmpc_tpu.learning.randomize import (
            randomize_payload,
            randomize_terrain,
        )

        ps = randomize_payload(spec, jax.random.PRNGKey(args.seed), B)
        tr = randomize_terrain(jax.random.PRNGKey(args.seed + 1), B)
    t0 = time.time()
    out = rollout(jnp.asarray(x0b), jnp.asarray(vdes), ps, tr)
    jax.block_until_ready(out.q)
    wall = time.time() - t0
    T = out.q.shape[1]
    print(f"{B} envs x {args.seconds}s in {wall:.1f}s wall "
          f"({B * T / wall:.0f} rows/s incl. compile)")

    states = np.asarray(out.state44).reshape(-1, 44)
    actions = np.asarray(out.action).reshape(-1, 12)
    valid = np.asarray(out.valid).reshape(-1) > 0.5
    goals = np.repeat(np.asarray(vdes), T, axis=0)
    traj_ids = np.repeat(np.arange(B), T)
    times = np.tile(np.arange(T) * 1e-3, B)

    db = Database(limit=max(int(valid.sum()), 1), goal_type="vc")
    db.append(states[valid], actions[valid], vc_goals=goals[valid],
              traj_id=traj_ids[valid], times=times[valid])
    db.save_as_hdf5(args.out)
    print(f"wrote {len(db)} rows ({valid.mean():.1%} valid) -> {args.out}")


if __name__ == "__main__":
    main()
