"""Detector adapters: normalized Detections + backend registry."""

from boxmot_tpu.detectors.base import BaseDetectorBackend, Detections  # noqa: F401
from boxmot_tpu.detectors.registry import get_detector_class, create_detector  # noqa: F401
