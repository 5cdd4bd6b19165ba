"""YAML <-> dataclass config IO — the reference's Hydra/OmegaConf layer.

The reference configures its learning pipelines through Hydra YAML files
(`Behavior_Cloning/examples/cfgs/bc_config.yaml`, `DAgger/cfgs/
iter_locosafedagger.yaml`) with command-line `key=value` overrides, and
pickles the resolved config next to each dataset for provenance
(`data_collection_force_perturbation.py:108-111`). This module provides the
same workflow over this framework's typed config dataclasses
(`TrainConfig`, `DataCollectionConfig`, `SafeDaggerConfig`, ...):

    cfg = load_config(TrainConfig, "cfgs/train.yaml",
                      overrides=["learning_rate=1e-4", "n_epochs=50"])
    save_config(cfg, run_dir + "/config.yaml")   # provenance snapshot

No Hydra dependency: plain PyYAML + dataclass reflection. Values are
coerced to the declared field types; unknown keys are an error (typo
guard, the role of Hydra's struct mode).
"""
from __future__ import annotations

import dataclasses
import datetime
import os
import typing
from typing import Any, Optional, Sequence, Type, TypeVar

import yaml

T = TypeVar("T")


def _coerce(value: Any, ftype: Any) -> Any:
    """Coerce a YAML-decoded value to a dataclass field type."""
    origin = typing.get_origin(ftype)
    if dataclasses.is_dataclass(ftype) and isinstance(value, dict):
        return _from_dict(ftype, value)
    import collections.abc

    if origin in (list, tuple, collections.abc.Sequence) or (
        origin is None and ftype in (list, tuple)
    ):
        args = typing.get_args(ftype)
        inner = args[0] if args and args[0] is not Ellipsis else None
        items = [
            _coerce(v, inner) if inner is not None else v for v in value
        ]
        return tuple(items)
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(ftype) if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0]) if args else value
    if ftype is bool and isinstance(value, bool):
        return value
    if ftype in (int, float, str) and value is not None:
        return ftype(value)
    return value


def _from_dict(cls: Type[T], data: dict) -> T:
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise KeyError(
            f"unknown config keys for {cls.__name__}: {sorted(unknown)}"
        )
    kwargs = {k: _coerce(v, fields[k].type) for k, v in data.items()}
    return cls(**kwargs)


def _resolve_field_types(cls) -> dict:
    """Field name -> resolved type (dataclass .type may be a string)."""
    hints = typing.get_type_hints(cls)
    return {f.name: hints.get(f.name, f.type) for f in dataclasses.fields(cls)}


def apply_overrides(cfg: T, overrides: Sequence[str]) -> T:
    """Hydra-style `key=value` overrides (dotted keys reach into nested
    dataclasses); values parsed as YAML scalars then coerced."""
    types_cache: dict = {}

    def set_one(obj, dotted: str, raw: str):
        head, _, rest = dotted.partition(".")
        cls = type(obj)
        if cls not in types_cache:
            types_cache[cls] = _resolve_field_types(cls)
        ftypes = types_cache[cls]
        if head not in ftypes:
            raise KeyError(
                f"unknown config key '{head}' for {cls.__name__}"
            )
        if rest:
            child = set_one(getattr(obj, head), rest, raw)
            return dataclasses.replace(obj, **{head: child})
        value = _coerce(yaml.safe_load(raw), ftypes[head])
        return dataclasses.replace(obj, **{head: value})

    for ov in overrides or ():
        key, sep, raw = ov.partition("=")
        if not sep:
            raise ValueError(f"override '{ov}' is not key=value")
        cfg = set_one(cfg, key.strip(), raw.strip())
    return cfg


def load_config(
    cls: Type[T],
    path: Optional[str] = None,
    overrides: Sequence[str] = (),
) -> T:
    """Build a config: dataclass defaults <- YAML file <- overrides."""
    data = {}
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        if not isinstance(data, dict):
            raise TypeError(f"{path} does not contain a mapping")
    # fill from defaults first so partial YAML files are fine
    fields = _resolve_field_types(cls)
    unknown = set(data) - set(fields)
    if unknown:
        raise KeyError(
            f"unknown config keys for {cls.__name__}: {sorted(unknown)}"
        )
    cfg = cls(**{k: _coerce(v, fields[k]) for k, v in data.items()})
    return apply_overrides(cfg, overrides)


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg, path: str) -> None:
    """YAML provenance snapshot next to a run's outputs (the role of the
    reference's pickled config)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [clean(x) for x in v]
        return v

    with open(path, "w") as f:
        yaml.safe_dump(clean(to_dict(cfg)), f, sort_keys=False)


def timestamped_run_dir(root: str, name: str = "run") -> str:
    """Hydra-style `outputs/<date>/<time>_<name>` run directory
    (reference `iter_locosafedagger.yaml:10-11`)."""
    now = datetime.datetime.now()
    d = os.path.join(
        root, now.strftime("%Y-%m-%d"), now.strftime("%H-%M-%S_") + name
    )
    os.makedirs(d, exist_ok=True)
    return d
