"""Hyperparameter tuning over cached replays."""

from boxmot_tpu.engine.tuning.tuner import Tuner, run_tune  # noqa: F401
