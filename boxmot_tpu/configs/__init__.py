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


TRAINING_RECIPES_DIR = Path(__file__).resolve().parent / "training"

# recipe keys that configure torch/torchvision machinery with no TPU
# equivalent, or eval-time behavior the repo handles elsewhere; listed so
# resolution is loud about what it drops rather than silently permissive
_RECIPE_IGNORED_KEYS = frozenset(
    {
        "preprocess",  # crop normalizer — export/runtime tier in this repo
        "random_patch",  # torchreid RandomPatch — not implemented
        "color_augmentation",  # AlexNet-style PCA jitter — not implemented
        "eta_min",  # cosine floor is lr/1000 in make_schedule
        "branch_loss_agg",  # LMBN multi-branch aggregation — single head here
    }
)

# nested hparams-style recipe sections (the CSL-TinyViT recipes;
# reference _flatten_training_recipe_values, configs/__init__.py:35-134)
_RECIPE_SECTIONS = (
    "run", "data", "model", "optimization", "losses",
    "augmentation", "evaluation", "system", "derived",
)

# (section path) -> flat recipe key
_NESTED_RECIPE_PATHS = {
    ("run", "model_name"): "model",
    ("run", "seed"): "seed",
    ("data", "dataset"): "dataset",
    ("data", "img_size"): "imgsz",
    ("data", "batch_size"): "batch_size",
    ("data", "sampler", "p"): "p_ids",
    ("data", "sampler", "k"): "k_instances",
    ("optimization", "epochs"): "epochs",
    ("optimization", "optimizer"): "optimizer",
    ("optimization", "lr"): "lr",
    ("optimization", "weight_decay"): "weight_decay",
    ("optimization", "grad_clip"): "grad_clip",
    ("optimization", "layer_decay"): "layer_decay",
    ("optimization", "vit_lr_profile"): "vit_lr_profile",
    ("optimization", "backbone_freeze_epochs"): "backbone_freeze_epochs",
    ("optimization", "scheduler", "warmup_epochs"): "warmup_epochs",
    ("optimization", "ema_decay"): "ema_decay",
    ("model", "head", "warmup_epochs"): "head_warmup_epochs",
    ("model", "head", "warmup_lr_mult"): "head_warmup_lr_mult",
    ("losses", "loss_type"): "loss",
    ("losses", "classifier_loss"): "classifier_loss",
    ("losses", "label_smooth"): "label_smooth",
    ("losses", "weights", "id_loss_weight"): "id_loss_weight",
    ("losses", "weights", "metric_loss_weight"): "metric_loss_weight",
    ("losses", "weights", "center_loss_weight"): "center_loss_weight",
    ("losses", "weights", "aux_ce_weight"): "aux_ce_weight",
    ("losses", "aux_ce_drop_epoch"): "aux_ce_drop_epoch",
    ("losses", "triplet", "margin"): "margin",
    ("losses", "triplet", "soft_margin"): "soft_margin",
    ("losses", "arcface", "scale"): "arcface_scale",
    ("losses", "arcface", "margin"): "arcface_margin",
    ("losses", "cosface", "scale"): "cosface_scale",
    ("losses", "cosface", "margin"): "cosface_margin",
    ("augmentation", "color_jitter"): "color_jitter",
    ("augmentation", "gaussian_blur"): "gaussian_blur",
    ("augmentation", "random_grayscale"): "random_grayscale",
    ("augmentation", "random_erasing"): "random_erasing",
    ("evaluation", "eval_interval"): "eval_interval",
    ("evaluation", "flip_tta"): "flip_tta",
}


def _flatten_nested_recipe(values: dict) -> dict:
    """Nested hparams recipe -> flat recipe vocabulary.  Architecture
    hyperparameters (model.head/attention/...) are baked into the named
    backbone variant here, so only train-arg paths are lifted."""
    out: dict = {}
    for path, key in _NESTED_RECIPE_PATHS.items():
        node = values
        for part in path:
            if not isinstance(node, dict) or part not in node:
                node = None
                break
            node = node[part]
        if node is not None:
            out[key] = node
    return out


def list_training_recipes() -> tuple[str, ...]:
    """Names of the shipped training recipes (reference
    configs/__init__.py:151-153 list_training_recipes)."""
    return tuple(sorted(p.stem for p in TRAINING_RECIPES_DIR.glob("*.yaml")))


def load_training_recipe(name: str) -> dict:
    """Raw recipe values by name (reference load_training_recipe,
    configs/__init__.py:137-148)."""
    path = TRAINING_RECIPES_DIR / f"{name}.yaml"
    if not path.exists():
        raise ValueError(
            f"unknown training recipe {name!r}; available: "
            f"{', '.join(list_training_recipes()) or '(none)'}"
        )
    with open(path) as f:
        values = yaml.safe_load(f) or {}
    # a flat recipe may legitimately contain a key that shares a section
    # name ("model: lmbn_n"); only dict-valued sections mark nesting
    if any(isinstance(values.get(s), dict) for s in _RECIPE_SECTIONS):
        values = _flatten_nested_recipe(values)
    return values


def train_config_kwargs_from_recipe(values: dict) -> dict:
    """Map reference recipe vocabulary onto TrainConfig field names.

    The reference trainer consumes recipes as flat train-arg dicts
    (configs/__init__.py:35-56); this repo's TrainConfig is step-based
    and jax-shaped, so keys are renamed (lr -> base_lr, margin ->
    triplet_margin, imgsz -> crop_hw, p_ids/k_instances -> p/k) and
    epoch counts pass through for the trainer to resolve against the
    dataset size.  Unknown keys raise; known-but-inapplicable keys
    (flip_tta, preprocess, ...) are dropped.
    """
    rename = {
        "lr": "base_lr",
        "margin": "triplet_margin",
        "p_ids": "p",
        "k_instances": "k",
        "id_loss_weight": "ce_weight",
        "metric_loss_weight": "triplet_weight",
    }
    passthrough = {
        "model", "dataset", "loss", "soft_margin", "epochs", "warmup_epochs",
        "weight_decay", "label_smooth", "center_loss_weight", "ema_decay",
        "random_erasing", "color_jitter", "gaussian_blur", "random_grayscale",
        "eval_interval", "seed", "steps", "warmup_steps",
        "grad_clip", "layer_decay", "vit_lr_profile", "center_lr",
        "head_warmup_epochs", "head_warmup_lr_mult", "backbone_freeze_epochs",
        "classifier_loss", "aux_ce_weight", "aux_ce_drop_epoch",
        "arcface_scale", "arcface_margin", "cosface_scale", "cosface_margin",
        "flip_tta",
    }
    out: dict = {}
    batch_size = None
    for key, val in values.items():
        if key in _RECIPE_IGNORED_KEYS:
            continue
        if key == "imgsz":
            out["crop_hw"] = tuple(val)
        elif key == "optimizer":
            out["optimizer"] = str(val).lower()  # reference spells "AdamW"
        elif key == "batch_size":
            batch_size = int(val)
        elif key in rename:
            out[rename[key]] = val
        elif key in passthrough:
            out[key] = val
        else:
            raise ValueError(f"unknown training-recipe key {key!r}")
    if batch_size is not None and "p" not in out:
        # recipes may give a flat batch size; keep K and derive P
        k = int(out.get("k", 4))
        out.setdefault("k", k)
        out["p"] = max(1, batch_size // k)
    return out


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
