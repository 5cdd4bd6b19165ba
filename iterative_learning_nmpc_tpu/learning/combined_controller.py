"""Learner/expert switching controller with a runtime safety monitor
(LocoSafeDAgger) — re-implements `DAgger/utils/Rollout_combined_controller.py`:

- both the policy and the MPC compute EVERY step so the expert's plan stays
  warm (`Rollout_combined_controller.py:484-499`),
- `check_unsafe_state_v2`: roll/pitch > 25 deg, height outside [0.18, 0.45] m,
  per-joint degree-bound table, velocity-tracking error > 0.10 m/s
  (`:367-446`),
- hysteresis: policy-only for the first `delay_steps` (100), MPC latched for
  at least `mpc_min_steps` (2500) once engaged (`:449-482`),
- `mpc_active` / `is_expert` flag recorded per step for expert relabeling.
"""
from __future__ import annotations

import numpy as np

from ..models import transforms_np as tnp
from ..mpc.controller import LocomotionMPC
from ..sim.mujoco_sim import Simulator
from .policy_controller import PolicyController


class CombinedController:
    def __init__(
        self,
        simulator: Simulator,
        mpc_controller: LocomotionMPC,
        policy_controller: PolicyController,
        v_des: np.ndarray = np.zeros(3),
        delay_steps: int = 100,
        mpc_min_steps: int = 2500,
        monitor: str = "v2",
    ):
        self.sim = simulator
        self.mpc_controller = mpc_controller
        self.policy_controller = policy_controller
        self.v_des = np.asarray(v_des, dtype=np.float64)
        # propagate the goal to BOTH sub-controllers (the reference wires
        # v_des at construction, `Rollout_combined_controller.py:283-287`);
        # without this the latched expert tracks a zero command and stands
        mpc_controller.set_command(self.v_des)
        policy_controller.set_command(self.v_des)
        self.delay_steps = delay_steps
        self.mpc_min_steps = mpc_min_steps
        self.monitor = monitor

        self.control_mode = "policy"
        self.step_counter = 0
        self.mpc_active_counter = 0
        self.mpc_active = False
        self.policy_active = True
        self.torques_dof = np.zeros(simulator.spec.nv)
        self.diverged = False
        self.mode_log = []

    def set_command(self, v_des, w_yaw: float = 0.0):
        self.v_des = np.asarray(v_des, dtype=np.float64)
        self.mpc_controller.set_command(self.v_des, w_yaw)
        self.policy_controller.set_command(self.v_des, w_yaw)

    # ------------------------------------------------------------------
    def check_unsafe_state_v1(self, mj_data) -> bool:
        """Fall/stall monitor (`Rollout_combined_controller.py:306-357`)."""
        q = np.asarray(mj_data.qpos)
        v = np.asarray(mj_data.qvel)
        ypr = tnp.matrix_to_ypr(tnp.quat_wxyz_to_matrix(q[3:7]))
        roll, pitch = ypr[2], ypr[1]
        unsafe_pose = (
            abs(roll) > np.deg2rad(30)
            or abs(pitch) > np.deg2rad(10)
            or q[2] < 0.18
            or q[2] > 0.45
            or np.linalg.norm(v[3:6]) > 5.0
        )
        stall = abs(self.v_des[0]) > 0.05 and abs(v[0]) < 0.015
        return bool(unsafe_pose or stall)

    def check_unsafe_state_v2(self, mj_data) -> bool:
        """Pose + joint-limit + velocity-tracking monitor (`:367-446`);
        single implementation shared with the batched plant collector
        (learning/safety.check_unsafe_state_v2)."""
        from .safety import check_unsafe_state_v2

        return check_unsafe_state_v2(
            np.asarray(mj_data.qpos), np.asarray(mj_data.qvel), self.v_des)

    def _unsafe(self, mj_data) -> bool:
        if self.monitor == "v1":
            return self.check_unsafe_state_v1(mj_data)
        if self.monitor == "dummy":
            # test/debug mode: flip to the expert purely on sim time — lets
            # pipeline tests exercise the switch + relabeling deterministically
            # without engineering an actual fall
            return mj_data.time > 2.0
        return self.check_unsafe_state_v2(mj_data)

    # ------------------------------------------------------------------
    def set_current_control_mode(self, mj_data) -> None:
        """Hysteresis switching (`Rollout_combined_controller.py:449-482`)."""
        self.step_counter += 1
        if self.step_counter < self.delay_steps:
            self.control_mode = "policy"
            return
        if self.control_mode == "mpc":
            self.mpc_active_counter += 1
            if self.mpc_active_counter < self.mpc_min_steps:
                return
            if not self._unsafe(mj_data):
                self.control_mode = "policy"
                self.mpc_active_counter = 0
        else:
            if self._unsafe(mj_data):
                self.control_mode = "mpc"
                self.mpc_active_counter = 0

    def compute_torques_dof(self, mj_data) -> None:
        # both controllers run every step; MPC plan stays warm (:486-487)
        self.policy_controller.compute_torques_dof(mj_data)
        self.mpc_controller.compute_torques_dof(mj_data)
        self.set_current_control_mode(mj_data)
        if self.control_mode == "policy":
            self.mpc_active = False
            self.policy_active = True
            self.torques_dof = np.asarray(self.policy_controller.torques_dof).copy()
        else:
            self.mpc_active = True
            self.policy_active = False
            self.torques_dof = np.asarray(self.mpc_controller.torques_dof).copy()
        self.mode_log.append(self.mpc_active)
        self.diverged = self.mpc_controller.diverged
