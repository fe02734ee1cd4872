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
    """Specs -> {param: default} runtime kwargs.

    Mirrors reference flatten_yaml_config (search_space.py:43-62): entries
    with an ``activates`` block have all descendants promoted to the top
    level; parents keep their own default.
    """
    out = {}

    def _visit(entries: dict) -> None:
        for key, spec in entries.items():
            if isinstance(spec, dict) and "default" in spec:
                out[key] = spec["default"]
                children = spec.get("activates")
                if isinstance(children, dict):
                    _visit(children)
            else:
                out[key] = spec

    _visit(specs)
    return out


def flatten_specs(specs: dict) -> dict:
    """Specs with ``activates`` children promoted to the top level, each
    keeping its full spec dict (reference flatten_yaml_config,
    search_space.py:43-62) — the form search backends consume."""
    out = {}

    def _visit(entries: dict) -> None:
        for key, spec in entries.items():
            if isinstance(spec, dict):
                out[key] = {k: v for k, v in spec.items() if k != "activates"}
                children = spec.get("activates")
                if isinstance(children, dict):
                    _visit(children)
            else:
                out[key] = spec

    _visit(specs)
    return out


def get_tracker_defaults(name: str) -> dict:
    try:
        return flatten_config(load_tracker_config(name))
    except FileNotFoundError:
        return {}


def available_tuned_configs() -> tuple[str, ...]:
    tuned_dir = Path(__file__).resolve().parent / "trackers" / "tuned"
    return tuple(sorted(p.stem for p in tuned_dir.glob("*.yaml")))


def load_tuned_config(name: str) -> dict:
    """Benchmark-tuned runtime params (reference configs/trackers/tuned/).

    ``name`` is "<tracker>_<benchmark>_<split>", e.g.
    "occluboost_mot17_ablation".  Returns base defaults overlaid with the
    tuned values — ready to pass as tracker params.
    """
    tuned_dir = Path(__file__).resolve().parent / "trackers" / "tuned"
    path = tuned_dir / f"{name}.yaml"
    if not path.exists():
        raise ValueError(
            f"unknown tuned config {name!r}; available: {available_tuned_configs()}"
        )
    tracker = name.split("_", 1)[0]
    with open(path) as f:
        overlay = yaml.safe_load(f) or {}
    return {**get_tracker_defaults(tracker), **overlay}


_MODES_PATH = Path(__file__).resolve().parent / "modes.yaml"
_MODES_CACHE: dict | None = None


def _modes() -> dict:
    global _MODES_CACHE
    if _MODES_CACHE is None:
        _MODES_CACHE = yaml.safe_load(_MODES_PATH.read_text()) or {}
    return _MODES_CACHE


def get_mode_defaults(mode: str) -> dict:
    """Merged defaults for a workflow mode: shared + runtime + the mode
    section (reference configs/__init__.py get_mode_defaults over
    modes.yaml)."""
    modes = _modes()
    mode = str(mode).lower()
    if mode not in modes and mode not in ("shared", "runtime"):
        raise ValueError(f"unknown mode {mode!r}; available: "
                         f"{sorted(k for k in modes if k not in ('shared', 'runtime'))}")
    out = dict(modes.get("shared") or {})
    out.update(modes.get("runtime") or {})
    out.update(modes.get(mode) or {})
    return out


def build_mode_namespace(mode: str, payload: dict | None = None,
                         explicit_keys=None):
    """Normalized SimpleNamespace for CLI / Python API workflows
    (reference build_mode_namespace, configs/__init__.py:245-280):
    defaults from modes.yaml, then payload values override — all payload
    keys win when explicit_keys is None, otherwise only the listed ones."""
    from types import SimpleNamespace

    values = get_mode_defaults(mode)
    payload = dict(payload or {})
    explicit = set(explicit_keys) if explicit_keys is not None else set(payload)
    for key, val in payload.items():
        if key in explicit or key not in values:
            values[key] = val
    values["mode"] = str(mode).lower()
    return SimpleNamespace(**values)
