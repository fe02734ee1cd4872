"""Tracker implementations (fixed-capacity SoA state + jitted steps)."""

from boxmot_tpu.trackers.base import BaseTracker  # noqa: F401
from boxmot_tpu.trackers.track_results import TrackResults  # noqa: F401
from boxmot_tpu.trackers.zoo import (  # noqa: F401
    TRACKER_MAPPING,
    TRACKER_REGISTRY,
    create_tracker,
    get_tracker_class,
)
