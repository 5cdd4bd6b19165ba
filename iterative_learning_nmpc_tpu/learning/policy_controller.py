"""Learned-policy and replay controllers.

- PolicyController: re-implements `Behavior_Cloning/utils/RolloutPolicy.py:213-402`
  — loads a policy payload {weights, (mu, sigma)}, per step assembles the
  44-dim state from the simulator, normalizes columns 1: (phase column
  excluded), appends the velocity goal (47 inputs), one jitted forward pass,
  then joint PD toward the predicted targets:
      tau = kp (a - q_joints) - kd v_joints          (RolloutPolicy.py:362)
- ReplayController: open-loop replay of recorded PD-target or raw-torque
  sequences (`Behavior_Cloning/utils/Rollout_MPC_replay.py:173-240`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.mujoco_sim import Simulator
from .network import load_policy
from .recorder import assemble_state, get_phase_percentage


class PolicyController:
    def __init__(
        self,
        simulator: Simulator,
        policy_path: str,
        v_des: np.ndarray = np.zeros(3),
        kp: float = 20.0,
        kd: float = 1.5,
        gait_period: float = 0.5,
        use_phase: bool = False,
    ):
        self.sim = simulator
        # v_des routes goal-scheduled bundles to the nearest-goal member
        # (plain payloads ignore it); selection is constant per rollout,
        # matching the reference's one-v_des-per-run protocol
        self.net, self.variables, norm = load_policy(policy_path, v_des=v_des)
        if norm is not None:
            self.state_mean = np.asarray(norm[0])
            self.state_std = np.where(np.asarray(norm[1]) > 1e-8, np.asarray(norm[1]), 1.0)
            self.goal_mean, self.goal_std = norm[2], norm[3]
        else:
            self.state_mean = None
        self.v_des = np.asarray(v_des, dtype=np.float64)
        self.kp, self.kd = kp, kd
        self.gait_period = gait_period
        self.use_phase = use_phase
        self.nu = simulator.spec.nu
        self.torques_dof = np.zeros(simulator.spec.nv)
        self.diverged = False
        self.last_action = np.zeros(self.nu)
        self.inference_ms = []

        variables = self.variables

        @jax.jit
        def forward(x):
            return self.net.apply(variables, x, train=False)

        self._forward = forward
        # warm up the jit so the first control step isn't the compile
        self._forward(jnp.zeros((1, self.net.input_size)))

    def set_command(self, v_des, w_yaw: float = 0.0):
        self.v_des = np.asarray(v_des, dtype=np.float64)

    def policy_input(self, mj_data) -> np.ndarray:
        q = np.asarray(mj_data.qpos)
        v = np.asarray(mj_data.qvel)
        feet_pos = np.array([self.sim.data.geom_xpos[g] for g in self.sim.foot_geoms])
        phase = get_phase_percentage(mj_data.time, self.gait_period, self.use_phase)
        state = assemble_state(q, v, feet_pos, phase)
        if self.state_mean is not None:
            state[1:] = (state[1:] - self.state_mean[1:]) / self.state_std[1:]
        goal = (self.v_des - self.goal_mean) / self.goal_std if self.state_mean is not None else self.v_des
        return np.concatenate([state, goal]).astype(np.float32)

    def compute_torques_dof(self, mj_data) -> None:
        import time

        x = self.policy_input(mj_data)
        t0 = time.perf_counter()
        a = np.asarray(self._forward(x[None]))[0]
        self.inference_ms.append((time.perf_counter() - t0) * 1e3)
        self.last_action = a
        q_j = np.asarray(mj_data.qpos)[7:]
        v_j = np.asarray(mj_data.qvel)[6:]
        tau = self.kp * (a - q_j) - self.kd * v_j
        self.torques_dof[-self.nu:] = tau


class ReplayController:
    """Open-loop replay of a recorded trajectory (PD-target or torque mode)."""

    def __init__(
        self,
        simulator: Simulator,
        actions: np.ndarray,
        mode: str = "pd_target",
        kp: float = 20.0,
        kd: float = 1.5,
    ):
        assert mode in ("pd_target", "torque")
        self.sim = simulator
        self.actions = np.asarray(actions)
        self.mode = mode
        self.kp, self.kd = kp, kd
        self.nu = simulator.spec.nu
        self.torques_dof = np.zeros(simulator.spec.nv)
        self.diverged = False
        self.step = 0

    def compute_torques_dof(self, mj_data) -> None:
        k = min(self.step, len(self.actions) - 1)
        a = self.actions[k]
        if self.mode == "pd_target":
            q_j = np.asarray(mj_data.qpos)[7:]
            v_j = np.asarray(mj_data.qvel)[6:]
            tau = self.kp * (a - q_j) - self.kd * v_j
        else:
            tau = a
        self.torques_dof[-self.nu:] = tau
        self.step += 1
