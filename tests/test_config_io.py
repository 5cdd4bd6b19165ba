"""YAML config layer (the reference's Hydra/OmegaConf equivalent,
bc_config.yaml / iter_locosafedagger.yaml workflow)."""
import dataclasses

import pytest

from iterative_learning_nmpc_tpu.learning.dagger import SafeDaggerConfig
from iterative_learning_nmpc_tpu.learning.datagen import DataCollectionConfig
from iterative_learning_nmpc_tpu.learning.train import TrainConfig
from iterative_learning_nmpc_tpu.utils.config_io import (
    apply_overrides,
    load_config,
    save_config,
)


def test_yaml_roundtrip(tmp_path):
    cfg = TrainConfig(learning_rate=5e-4, n_epochs=42, run_name="rt")
    p = str(tmp_path / "train.yaml")
    save_config(cfg, p)
    cfg2 = load_config(TrainConfig, p)
    assert cfg2 == cfg


def test_partial_yaml_uses_defaults(tmp_path):
    p = tmp_path / "partial.yaml"
    p.write_text("n_epochs: 7\nbatch_size: 64\n")
    cfg = load_config(TrainConfig, str(p))
    assert cfg.n_epochs == 7 and cfg.batch_size == 64
    assert cfg.learning_rate == TrainConfig().learning_rate


def test_overrides_and_coercion():
    cfg = load_config(
        SafeDaggerConfig,
        overrides=["n_epochs=3", "sim_time=2.5",
                   "goals=[[0.1,0,0],[0,0,0]]"],
    )
    assert cfg.n_epochs == 3 and cfg.sim_time == 2.5
    assert cfg.goals == ((0.1, 0, 0), (0, 0, 0))
    # sequences land as tuples (hashable, dataclass-friendly)
    assert isinstance(cfg.goals[0], tuple)


def test_unknown_key_is_error(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("learning_rat: 1e-4\n")
    with pytest.raises(KeyError):
        load_config(TrainConfig, str(p))
    with pytest.raises(KeyError):
        apply_overrides(TrainConfig(), ["nope=1"])


def test_force_ranges_coerced():
    cfg = load_config(
        DataCollectionConfig, overrides=["force_magnitude=[40, 60]"]
    )
    assert cfg.force_magnitude == (40.0, 60.0)
    assert dataclasses.is_dataclass(cfg)
