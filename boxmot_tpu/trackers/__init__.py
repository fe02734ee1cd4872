"""Tracker implementations (fixed-capacity SoA state + jitted steps)."""

from boxmot_tpu.trackers.base import BaseTracker  # noqa: F401
from boxmot_tpu.trackers.track_results import TrackResults  # noqa: F401
from boxmot_tpu.trackers.zoo import (  # noqa: F401
    TRACKER_MAPPING,
    TRACKER_REGISTRY,
    create_tracker,
    get_tracker_class,
)

# Tracker classes re-exported lazily, mirroring the reference package
# surface (boxmot/trackers/__init__.py re-exports all tracker classes).
_TRACKER_EXPORTS = {
    "BoostTrack": "boxmot_tpu.trackers.boosttrack",
    "BotSort": "boxmot_tpu.trackers.botsort",
    "ByteTrack": "boxmot_tpu.trackers.bytetrack",
    "DeepOcSort": "boxmot_tpu.trackers.deepocsort",
    "HybridSort": "boxmot_tpu.trackers.hybridsort",
    "OccluBoost": "boxmot_tpu.trackers.occluboost",
    "OcSort": "boxmot_tpu.trackers.ocsort",
    "Sam2Mot": "boxmot_tpu.trackers.sam2mot",
    "SFSORT": "boxmot_tpu.trackers.sfsort",
    "StrongSort": "boxmot_tpu.trackers.strongsort",
}

__all__ = (
    "BaseTracker",
    "TrackResults",
    "TRACKER_MAPPING",
    "TRACKER_REGISTRY",
    "create_tracker",
    "get_tracker_class",
    *_TRACKER_EXPORTS,
)


def __getattr__(name):
    mod = _TRACKER_EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'boxmot_tpu.trackers' has no attribute {name!r}")
    from importlib import import_module

    return getattr(import_module(mod), name)
