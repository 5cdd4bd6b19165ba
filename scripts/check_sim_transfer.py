"""Measure jax_sim-vs-MuJoCo divergence on a WALKING trajectory.

Protocol (VERDICT r2 item 1): run the MPC expert closed-loop in MuJoCo,
record the applied torque sequence, replay the exact torques open-loop in
the soft-contact jax_sim from the identical initial state, and report the
base-state divergence over time. This calibrates the bound asserted by
tests/test_sim_transfer.py.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from iterative_learning_nmpc_tpu.mpc.controller import LocomotionMPC
from iterative_learning_nmpc_tpu.models import transforms_np as tnp
from iterative_learning_nmpc_tpu.robots.go2 import go2_spec
from iterative_learning_nmpc_tpu.sim import jax_sim
from iterative_learning_nmpc_tpu.sim.mujoco_sim import DataRecorder, Simulator


class TorqueRecorder(DataRecorder):
    def __init__(self):
        super().__init__()
        self.q, self.v, self.ctrl = [], [], []

    def record(self, mj_data):
        self.q.append(np.asarray(mj_data.qpos).copy())
        self.v.append(np.asarray(mj_data.qvel).copy())
        self.ctrl.append(np.asarray(mj_data.ctrl).copy())


def main():
    spec = go2_spec()
    sim = Simulator(spec)
    mpc = LocomotionMPC(spec, gait_name="trot", solve_async=False)
    mpc.set_command(np.array([0.3, 0.0, 0.0]))
    rec = TorqueRecorder()
    res = sim.run(sim_time=1.0, controller=mpc, data_recorder=rec)
    print("mujoco walk:", res)
    Qm = np.stack(rec.q)
    Vm = np.stack(rec.v)
    TAU = np.stack(rec.ctrl)
    # recorder runs after compute_torques + data.ctrl assignment and before
    # mj_step: row k is the state at step k and the torque applied during it

    # chart initial state
    q0c, v0c = tnp.convert_from_mujoco(Qm[0], Vm[0])
    st = jax_sim.SimState(jnp.asarray(q0c, jnp.float32),
                          jnp.asarray(v0c, jnp.float32),
                          jnp.asarray(0.0, jnp.float32))
    cp = jax_sim.contact_params_for(spec)

    tau_seq = jnp.asarray(TAU, jnp.float32)

    def body(s, tau):
        s2 = jax_sim.step(spec, s, tau, cp, 1.0e-3)
        return s2, (s2.q, s2.v)

    _, (Qj, Vj) = jax.jit(
        lambda s, taus: jax.lax.scan(body, s, taus))(st, tau_seq)
    Qj = np.asarray(Qj)

    # mujoco chart trajectory for comparison (state AFTER step k = row k+1)
    Qc = np.stack([tnp.convert_from_mujoco(q, v)[0]
                   for q, v in zip(Qm[1:], Vm[1:])])
    T = min(len(Qc), len(Qj))
    pos_err = np.linalg.norm(Qj[:T, :2] - Qc[:T, :2], axis=1)
    z_err = np.abs(Qj[:T, 2] - Qc[:T, 2])
    tilt_err = np.abs(Qj[:T, 4:6] - Qc[:T, 4:6]).max(axis=1)
    for ms in (100, 250, 500, 750, T - 1):
        if ms < T:
            print(f"t={ms:4d} ms  |xy|err={pos_err[ms]:.4f} m  "
                  f"z err={z_err[ms]:.4f} m  tilt err={tilt_err[ms]:.4f} rad")
    print("fell in jax_sim:", bool((Qj[:T, 2] < 0.12).any()),
          " min z:", Qj[:T, 2].min())

    # --- PD-target replay (reference ReplayController protocol) ---------
    # realized PD-target action encoding (Rollout_MPC.py:298): the replay
    # reconstructs the same torque where states agree and adds stabilizing
    # joint feedback where they drift.
    kp, kd = 20.0, 1.5
    A = (TAU + kd * Vm[:, 6:]) / kp + Qm[:, 7:]

    def body_pd(s, a):
        tau = kp * (a - s.q[6:]) - kd * s.v[6:]
        s2 = jax_sim.step(spec, s, tau, cp, 1.0e-3)
        return s2, (s2.q, s2.v)

    _, (Qp, Vp) = jax.jit(
        lambda s, acts: jax.lax.scan(body_pd, s, acts))(
            st, jnp.asarray(A, jnp.float32))
    Qp = np.asarray(Qp)
    pos_err = np.linalg.norm(Qp[:T, :2] - Qc[:T, :2], axis=1)
    z_err = np.abs(Qp[:T, 2] - Qc[:T, 2])
    tilt_err = np.abs(Qp[:T, 4:6] - Qc[:T, 4:6]).max(axis=1)
    print("--- PD-target replay ---")
    for ms in (100, 250, 500, 750, T - 1):
        if ms < T:
            print(f"t={ms:4d} ms  |xy|err={pos_err[ms]:.4f} m  "
                  f"z err={z_err[ms]:.4f} m  tilt err={tilt_err[ms]:.4f} rad")
    print("fell in jax_sim:", bool((Qp[:T, 2] < 0.12).any()),
          " min z:", Qp[:T, 2].min(),
          " x progress mj/jax:", Qc[T - 1, 0] - Qc[0, 0],
          Qp[T - 1, 0] - Qp[0, 0])


if __name__ == "__main__":
    main()
