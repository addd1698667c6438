"""YAML config layering + dotted CLI overrides (mini-Hydra, L7).

`load_experiment("light")` reads configs/light.yaml; a `_base_: default` key
composes on top of another file (the reference's Hydra defaults-list
capability, configs/model/light.yaml:1-9). CLI overrides are
`path.to.field=value` strings with YAML-parsed values."""

import os
from typing import Optional

import yaml

from ..config import ExperimentConfig, finalize, from_dict, merge_overrides, to_dict

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "configs")


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml_layered(name_or_path: str, config_dir: Optional[str] = None) -> dict:
    config_dir = config_dir or CONFIG_DIR
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(config_dir, f"{name_or_path}.yaml")
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base_name = data.pop("_base_", None)
    if base_name:
        base = _load_yaml_layered(base_name, config_dir)
        data = _deep_merge(base, data)
    return data


def parse_override(kv: str) -> tuple[str, object]:
    key, _, value = kv.partition("=")
    return key.strip(), yaml.safe_load(value)


def load_experiment(
    name_or_path: str = "default",
    overrides: Optional[list[str]] = None,
    config_dir: Optional[str] = None,
) -> ExperimentConfig:
    data = _load_yaml_layered(name_or_path, config_dir)
    cfg = from_dict(ExperimentConfig, data)
    if overrides:
        cfg = merge_overrides(cfg, dict(parse_override(o) for o in overrides))
    return finalize(cfg)


def save_experiment(cfg: ExperimentConfig, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)
