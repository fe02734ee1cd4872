"""Tracker registry — mirror of boxmot/trackers/tracker_zoo.py:14-148.

Maps tracker names to classes and builds configured instances.  Config
resolution order: built-in defaults < per-tracker config dict < kwargs.
"""

from __future__ import annotations

import importlib

TRACKER_MAPPING = {
    "bytetrack": "boxmot_tpu.trackers.bytetrack.ByteTrack",
    "ocsort": "boxmot_tpu.trackers.ocsort.OcSort",
    "botsort": "boxmot_tpu.trackers.botsort.BotSort",
    "sfsort": "boxmot_tpu.trackers.sfsort.SFSORT",
    "deepocsort": "boxmot_tpu.trackers.deepocsort.DeepOcSort",
    "boosttrack": "boxmot_tpu.trackers.boosttrack.BoostTrack",
    "occluboost": "boxmot_tpu.trackers.occluboost.OccluBoost",
    "strongsort": "boxmot_tpu.trackers.strongsort.StrongSort",
    "hybridsort": "boxmot_tpu.trackers.hybridsort.HybridSort",
    "sam2mot": "boxmot_tpu.trackers.sam2mot.Sam2Mot",
}

# Trackers that consume appearance embeddings (tracker_zoo.py:12).
REID_TRACKERS = {"botsort", "deepocsort", "strongsort", "boosttrack", "occluboost", "hybridsort"}


def get_tracker_class(name: str):
    try:
        path = TRACKER_MAPPING[name]
    except KeyError:
        raise ValueError(
            f"Unknown tracker {name!r}; available: {sorted(TRACKER_MAPPING)}"
        ) from None
    module, cls = path.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def parse_tracker_spec(spec: str) -> tuple[str, str]:
    """Parse "name" / "name:backend" into (name, backend).

    Mirror of the reference's TrackerSpec parse (trackers/specs.py:10-88);
    backends: "tpu" (device programs, default) and "cpp" (native
    slot-bank cores, boxmot_tpu/native/trackers.py).
    """
    name, _, backend = spec.partition(":")
    backend = backend or "tpu"
    if backend not in ("tpu", "cpp"):
        raise ValueError(f"unknown tracker backend {backend!r} in {spec!r}")
    return name, backend


def create_tracker(
    tracker_type: str,
    tracker_config: dict | None = None,
    reid_weights=None,
    device=None,
    half: bool = False,
    per_class: bool = False,
    evolve_param_dict: dict | None = None,
    backend: str | None = None,
    **kwargs,
):
    """Build a tracker instance by name.

    Signature parity with reference create_tracker (tracker_zoo.py:33-148);
    reid_weights/device/half are accepted for API compatibility — ReID
    model wiring lands with the appearance trackers.  `tracker_type` may
    carry a backend suffix ("bytetrack:cpp") or the backend can be given
    explicitly; "cpp" dispatches to the native slot-bank cores (reference
    native dispatch: tracker_zoo.py:33-60 backend=="cpp").
    """
    if ":" in tracker_type:
        tracker_type, spec_backend = parse_tracker_spec(tracker_type)
        backend = backend or spec_backend
    backend = backend or "tpu"
    cls = get_tracker_class(tracker_type)
    if tracker_config is None:
        from boxmot_tpu.configs import get_tracker_defaults

        params = get_tracker_defaults(tracker_type)
    elif isinstance(tracker_config, dict):
        params = dict(tracker_config)
    else:
        # YAML path: load specs and flatten to runtime defaults
        import yaml

        from boxmot_tpu.configs import flatten_config

        with open(tracker_config) as f:
            params = flatten_config(yaml.safe_load(f) or {})
    if evolve_param_dict:
        params.update(evolve_param_dict)
    params.update(kwargs)
    if backend == "cpp":
        from boxmot_tpu.native.trackers import NATIVE_LIVE_TRACKERS, NativeTracker

        if tracker_type not in NATIVE_LIVE_TRACKERS:
            raise ValueError(
                f"no native (cpp) core for {tracker_type!r}; "
                f"available: {sorted(NATIVE_LIVE_TRACKERS)}"
            )
        return NativeTracker(tracker_type, per_class=per_class, **params)
    params["per_class"] = per_class
    if reid_weights is not None and tracker_type in REID_TRACKERS:
        from boxmot_tpu.reid.backends import create_reid

        params.setdefault("reid_model", create_reid(weights=reid_weights, half=half))
    return cls(**params)


TRACKER_REGISTRY = TRACKER_MAPPING
