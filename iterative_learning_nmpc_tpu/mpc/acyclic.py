"""Acyclic MPC: externally supplied (non-periodic) contact sequences.

Re-implements `mpc_controller/mpc_acyclic.py:8-86`: an MPC variant driven by
an `AcyclicContactPlanner` carrying an arbitrary finite contact sequence and
contact patches (center / rotation / size). First solve runs a high
iteration budget, steady state runs 1 (RTI) (`mpc_acyclic.py:40-47`).

The patch geometry maps onto the OCP parameter surface as: plane_point =
patch center, restriction active, patch half-extent as the hard radius of
the patch hinge (`OCPParams.patch_radius` — the reference's `range_radius`),
plus the quadratic foot-displacement pull toward the center.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..gait.planner import AcyclicContactPlanner
from ..robots.spec import RobotSpec
from .controller import LocomotionMPC


class AcyclicMPC(LocomotionMPC):
    def __init__(
        self,
        spec: RobotSpec,
        gait_name: str = "trot",
        n_sqp_first: int = 50,
        **kwargs,
    ):
        super().__init__(spec, gait_name=gait_name, **kwargs)
        self.acyclic_planner = AcyclicContactPlanner()
        self.config_opt.max_iter_first = n_sqp_first
        self.restrict_cnt = True

    def set_contact_sequence(self, cnt_sequence: np.ndarray) -> None:
        self.acyclic_planner.set_sequence(cnt_sequence)

    def set_patches(self, centers: np.ndarray, rotations: np.ndarray,
                    sizes: np.ndarray) -> None:
        self.acyclic_planner.set_center_rot_size(centers, rotations, sizes)

    # Override the parameter assembly to pull from the acyclic planner.
    def optimize(self, q: np.ndarray, v: np.ndarray):
        from ..solver.sqp import make_params
        import jax
        import jax.numpy as jnp

        node = self.current_opt_node
        N = self.config_opt.n_nodes
        cnt = self.acyclic_planner.get_sequence(node, N + 1).astype(np.float32)
        peak = self.acyclic_planner.get_peak(node, N + 1).astype(np.float32)
        centers = sizes = None
        if self.acyclic_planner.center_sequence is not None:
            centers, _, sizes = self.acyclic_planner.get_center_rot_size_patch(
                node, N + 1
            )

        base_ref, base_ref_e = self.compute_base_ref_vel_tracking(q)
        x0 = np.concatenate([q, v]).astype(np.float32)
        plane = np.zeros((4, N + 1, 3), dtype=np.float32)
        plane[:, :, 2] = self._ground
        cnt_loc = np.zeros((4, N + 1, 3), np.float32)
        patch_radius = None
        if centers is not None:
            c = np.asarray(centers, dtype=np.float32).reshape(4, N + 1, 3)
            plane[:, :, :2] = c[:, :, :2]
            cnt_loc = c
        if sizes is not None:
            # patch half-extent as the hard radius (reference passes
            # cnt_size to the solver's range restriction, mpc_acyclic.py:69-83)
            s = np.asarray(sizes, dtype=np.float32).reshape(4, N + 1, -1)
            patch_radius = 0.5 * s.min(axis=-1)

        params = make_params(
            self.solver, x0, cnt, peak=peak, plane_point=plane,
            cnt_loc=cnt_loc, patch_radius=patch_radius,
            restrict=1.0 if centers is not None else 0.0,
            base_ref=base_ref.astype(np.float32),
            base_ref_e=base_ref_e.astype(np.float32),
            joint_ref=self.joint_ref.astype(np.float32),
            step_height=self.config_gait.step_height + self._ground,
            ground_height=self._ground,
        )
        return self._solve_plan(params, node)
