"""boxmot_tpu — TPU-native multi-object tracking framework.

A ground-up JAX/XLA/Pallas re-design of the BoxMOT tracking-by-detection
stack (reference: mikel-brostrom/boxmot).  Trackers are expressed as
fixed-capacity struct-of-arrays state updated by a single jitted per-frame
step function; association, Kalman filtering and assignment all run on
device inside one XLA program.  Python keeps only I/O, configuration and
workflow orchestration.

Public surface (mirrors reference boxmot/__init__.py:12-50):
    create_tracker, TRACKER_REGISTRY, TrackResults, __version__
"""

__version__ = "0.1.0"

_LAZY = {
    "Boxmot": "boxmot_tpu.api",
    "track": "boxmot_tpu.api",
    "evaluate": "boxmot_tpu.api",
    "create_tracker": "boxmot_tpu.trackers.zoo",
    "get_tracker_config": "boxmot_tpu.trackers.zoo",
    "TRACKER_REGISTRY": "boxmot_tpu.trackers.zoo",
    "TrackResults": "boxmot_tpu.trackers.track_results",
    "ByteTrack": "boxmot_tpu.trackers.bytetrack",
    "OcSort": "boxmot_tpu.trackers.ocsort",
    "BotSort": "boxmot_tpu.trackers.botsort",
    # workflow result types (reference boxmot/__init__.py:14-27)
    "ValidationResult": "boxmot_tpu.engine.results",
    "GenerateResult": "boxmot_tpu.engine.results",
    "TuneResult": "boxmot_tpu.engine.results",
    "TuneTrialResult": "boxmot_tpu.engine.results",
    "ExportResult": "boxmot_tpu.engine.results",
    "TrackRunResult": "boxmot_tpu.engine.results",
    "TrainResult": "boxmot_tpu.engine.results",
    "ResearchResult": "boxmot_tpu.engine.results",
}

__all__ = sorted(_LAZY) + ["__version__"]


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module 'boxmot_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)
