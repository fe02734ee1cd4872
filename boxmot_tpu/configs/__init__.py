"""Config system: per-tracker YAMLs that serve simultaneously as runtime
defaults and hyperparameter search spaces.

Mirror of the reference three-tier config system (boxmot/configs/
__init__.py:16-120 + engine/tuning/search_space.py:43 flatten):
each tracker YAML maps param -> {type, default, range/options}.
"""

from __future__ import annotations

from pathlib import Path

import yaml

TRACKER_CONFIG_DIR = Path(__file__).parent / "trackers"


def get_tracker_config_path(name: str) -> Path:
    path = TRACKER_CONFIG_DIR / f"{name}.yaml"
    if not path.exists():
        raise FileNotFoundError(f"no config for tracker {name!r} at {path}")
    return path


def load_tracker_config(name: str) -> dict:
    """Full param specs: {param: {type, default, range/options}}."""
    with open(get_tracker_config_path(name)) as f:
        return yaml.safe_load(f) or {}


def flatten_config(specs: dict) -> dict:
    """Specs -> {param: default} runtime kwargs (search_space.py:43)."""
    out = {}
    for key, spec in specs.items():
        if isinstance(spec, dict) and "default" in spec:
            out[key] = spec["default"]
        else:
            out[key] = spec
    return out


def get_tracker_defaults(name: str) -> dict:
    try:
        return flatten_config(load_tracker_config(name))
    except FileNotFoundError:
        return {}
