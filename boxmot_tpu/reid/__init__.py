"""Appearance embedding (ReID) stack: Flax backbones + device pipeline."""

from boxmot_tpu.reid.core import ReID, MODEL_FACTORY  # noqa: F401
from boxmot_tpu.reid.backends import create_reid, TFLiteReID, SavedModelReID  # noqa: F401
