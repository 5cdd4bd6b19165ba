"""LocoSafeDAgger: iterative expert-relabeled imitation learning.

Re-implements the reference's L4 orchestration:
- `SafeDaggerDataCollection` (`DAgger/utils/data_collection_locosafedagger.py:22-231`):
  one combined-controller rollout, keep ONLY expert-labeled timesteps,
  aggregate with the previous dataset into `agg_dataset.hdf5`, report the
  expert-influence ratio.
- `SafeDaggerTraining` (`DAgger/utils/train_locosafedagger.py:34-200`):
  warm-started fine-tuning on the aggregated dataset (15 epochs, Adam 1e-3).
- `SafeDaggerPipeline` (`DAgger/example/iter_locosafedagger.py:16-112`):
  (collect -> aggregate -> train)^n per velocity goal, threading policy and
  dataset paths between stages.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from ..robots.spec import RobotSpec
from .database import Database
from .rollouts import rollout_combined
from .train import BehavioralCloning, TrainConfig


@dataclass
class SafeDaggerConfig:
    record_dir: str = "./dagger"
    sim_time: float = 10.0
    gait_name: str = "trot"
    database_size: int = 10_000_000
    n_epochs: int = 15
    learning_rate: float = 1.0e-3
    batch_size: int = 256
    monitor: str = "v2"
    delay_steps: int = 100
    mpc_min_steps: int = 2500
    goals: Sequence[Sequence[float]] = ((0.15, 0.0, 0.0), (0.0, 0.0, 0.0), (-0.15, 0.0, 0.0))
    n_iterations_per_goal: int = 4
    seed: int = 0


class SafeDaggerDataCollection:
    def __init__(self, spec: RobotSpec, cfg: SafeDaggerConfig):
        self.spec = spec
        self.cfg = cfg
        self.expert_ratio_history: List[float] = []

    def collect(self, policy_path: str, v_des, prev_dataset: Optional[str],
                tag: str) -> str:
        """One DAgger data step: rollout, filter expert rows, aggregate."""
        cfg = self.cfg
        out_dir = os.path.join(cfg.record_dir, tag)
        os.makedirs(out_dir, exist_ok=True)
        rollout = rollout_combined(
            self.spec, policy_path, sim_time=cfg.sim_time,
            v_des=np.asarray(v_des), gait_name=cfg.gait_name,
            record_dir=out_dir, monitor=cfg.monitor,
            delay_steps=cfg.delay_steps, mpc_min_steps=cfg.mpc_min_steps,
        )
        rec = rollout.recorder
        is_expert = np.asarray(rec.data["is_expert"], dtype=bool)
        ratio = float(is_expert.mean()) if len(is_expert) else 0.0
        self.expert_ratio_history.append(ratio)
        print(f"[dagger] {tag}: expert-influence ratio {ratio:.3f} "
              f"({is_expert.sum()}/{len(is_expert)} steps)")

        db = Database(limit=cfg.database_size, goal_type="vc")
        if prev_dataset is not None and os.path.exists(prev_dataset):
            db.load_saved_database(prev_dataset)
        if is_expert.any():
            # keep only expert-labeled timesteps (reference `:179-206`)
            states = np.asarray(rec.data["state"])[is_expert]
            actions = np.asarray(rec.data["action"])[is_expert]
            vc = np.asarray(rec.data["vc_goals"])[is_expert]
            cc = np.asarray(rec.data["cc_goals"])[is_expert]
            times = np.asarray(rec.data["time"])[is_expert]
            db.append(states, actions, vc_goals=vc, cc_goals=cc,
                      traj_id=np.full(len(states), len(self.expert_ratio_history)),
                      times=times)
        agg_path = os.path.join(out_dir, "agg_dataset.hdf5")
        db.save_as_hdf5(agg_path, config=cfg)
        return agg_path


class SafeDaggerPipeline:
    """The outer iterative-learning loop (reference `iter_locosafedagger.py`)."""

    def __init__(self, spec: RobotSpec, cfg: SafeDaggerConfig,
                 initial_policy: str, initial_dataset: Optional[str] = None):
        self.spec = spec
        self.cfg = cfg
        self.policy_path = initial_policy
        self.dataset_path = initial_dataset
        self.collector = SafeDaggerDataCollection(spec, cfg)

    def run_training(self, dataset_path: str, tag: str) -> str:
        cfg = self.cfg
        db = Database(limit=cfg.database_size, goal_type="vc")
        db.load_saved_database(dataset_path)
        if len(db) < cfg.batch_size:
            print(f"[dagger] {tag}: dataset too small ({len(db)}), skip training")
            return self.policy_path
        tc = TrainConfig(
            learning_rate=cfg.learning_rate,
            batch_size=cfg.batch_size,
            n_epochs=cfg.n_epochs,
            save_dir=os.path.join(cfg.record_dir, "policies"),
            run_name=tag,
            seed=cfg.seed,
        )
        bc = BehavioralCloning(tc)
        return bc.run(db, warm_start_path=self.policy_path)

    def run(self) -> str:
        """(collect -> train) x n_iterations per goal; returns final policy."""
        for gi, goal in enumerate(self.cfg.goals):
            for it in range(self.cfg.n_iterations_per_goal):
                tag = f"goal{gi}_iter{it}"
                self.dataset_path = self.collector.collect(
                    self.policy_path, goal, self.dataset_path, tag
                )
                self.policy_path = self.run_training(self.dataset_path, tag)
        return self.policy_path
