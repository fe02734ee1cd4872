"""Runtime backends for exported ReID artifacts + suffix dispatch.

Role mirror of boxmot/reid/backends/ (suffix-dispatched pytorch /
torchscript / onnx / openvino / tensorrt / tflite runtimes behind one
``get_features`` contract, reid/core/reid.py:26-66).  The formats this
environment can execute:

- model name or torchreid ``.pt``  -> JAX/Flax device path (ReID)
- flax ``.msgpack`` checkpoint     -> JAX/Flax device path (ReID)
- ``.tflite``                      -> TFLite interpreter backend
- SavedModel directory             -> TensorFlow backend

All backends share crop extraction (ops/crops.py, the same sampling the
device path uses) and L2-normalized float32 output, so embeddings are
interchangeable across runtimes.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from boxmot_tpu.ops.crops import extract_crops


def _crops_np(xyxys: np.ndarray, img: np.ndarray, crop_hw) -> np.ndarray:
    """Standardized (N, H, W, 3) float32 crops; BGR frame in, RGB out."""
    import jax.numpy as jnp

    xyxys = np.asarray(xyxys, np.float32)
    is_obb = xyxys.ndim == 2 and xyxys.shape[1] >= 5
    crops = extract_crops(
        jnp.asarray(img)[..., ::-1], jnp.asarray(xyxys), out_hw=crop_hw,
        is_obb=is_obb,
    )
    return np.asarray(crops, np.float32)


def _l2norm(feats: np.ndarray) -> np.ndarray:
    feats = np.asarray(feats, np.float32)
    norm = np.linalg.norm(feats, axis=-1, keepdims=True)
    return feats / np.maximum(norm, 1e-12)


class TFLiteReID:
    """TFLite interpreter runtime (reference tflite_backend.py role).

    The exporter writes a batch-1 signature; the interpreter's input is
    resized per batch when the runtime allows it, else crops run one at
    a time.
    """

    def __init__(self, weights: str | Path, crop_hw=(256, 128),
                 model_name: str | None = None):
        import tensorflow as tf

        self.weights = Path(weights)
        self.model_name = model_name or self.weights.stem
        self.crop_hw = crop_hw
        self._interp = tf.lite.Interpreter(model_path=str(self.weights))
        self._interp.allocate_tensors()
        self._inp = self._interp.get_input_details()[0]
        self._out = self._interp.get_output_details()[0]
        self._batch_resizable = True
        self._native_shape = tuple(self._inp["shape"])
        self.feature_dim = int(self._out["shape"][-1])

    def _resize(self, shape: tuple) -> None:
        self._interp.resize_tensor_input(self._inp["index"], shape)
        self._interp.allocate_tensors()
        self._inp = self._interp.get_input_details()[0]
        self._out = self._interp.get_output_details()[0]

    def _invoke(self, batch: np.ndarray) -> np.ndarray:
        if self._batch_resizable and tuple(self._inp["shape"]) != batch.shape:
            try:
                self._resize(batch.shape)
            except Exception:
                # fixed-batch model: restore the exported shape and loop
                # per crop (restoring the original shape always succeeds)
                self._batch_resizable = False
                self._resize(self._native_shape)
        if tuple(self._inp["shape"]) != batch.shape:
            if tuple(self._inp["shape"][1:]) != batch.shape[1:]:
                raise ValueError(
                    f"crop shape {batch.shape[1:]} does not match the tflite "
                    f"model input {tuple(self._inp['shape'][1:])}; pass the "
                    "crop_hw the model was exported with"
                )
            return np.concatenate(
                [self._invoke(batch[i : i + 1]) for i in range(len(batch))]
            )
        self._interp.set_tensor(self._inp["index"], batch.astype(np.float32))
        self._interp.invoke()
        return np.array(self._interp.get_tensor(self._out["index"]))

    def get_features(self, xyxys, img) -> np.ndarray:
        xyxys = np.asarray(xyxys, np.float32)
        if len(xyxys) == 0:
            return np.zeros((0, self.feature_dim), np.float32)
        crops = _crops_np(xyxys, img, self.crop_hw)
        return _l2norm(self._invoke(crops))

    __call__ = get_features


class SavedModelReID:
    """TensorFlow SavedModel runtime (reference openvino/onnx role)."""

    def __init__(self, weights: str | Path, crop_hw=(256, 128),
                 model_name: str | None = None):
        import tensorflow as tf  # noqa: F401

        from tensorflow import saved_model

        self.weights = Path(weights)
        self.model_name = model_name or self.weights.name
        self.crop_hw = crop_hw
        self._module = saved_model.load(str(self.weights))
        probe = np.zeros((1, *crop_hw, 3), np.float32)
        self.feature_dim = int(np.asarray(self._module.fwd(probe)).shape[-1])

    def get_features(self, xyxys, img) -> np.ndarray:
        xyxys = np.asarray(xyxys, np.float32)
        if len(xyxys) == 0:
            return np.zeros((0, self.feature_dim), np.float32)
        crops = _crops_np(xyxys, img, self.crop_hw)
        # exported signature is batch-1: run per crop
        feats = np.concatenate(
            [np.asarray(self._module.fwd(crops[i : i + 1])) for i in range(len(crops))]
        )
        return _l2norm(feats)

    __call__ = get_features


def create_reid(weights=None, **kwargs):
    """Suffix-dispatched ReID construction (reid/core/reid.py:26-66).

    Accepts a model name ("osnet_x0_25"), a torchreid ``.pt``/``.pth``
    checkpoint, a flax ``.msgpack`` checkpoint, a ``.tflite`` artifact,
    or a SavedModel directory.
    """
    from .core import ReID

    if weights is None:
        return ReID(**kwargs)
    p = Path(str(weights))
    suffix = p.suffix.lower()
    if suffix == ".tflite":
        kwargs.pop("half", None)
        kwargs.pop("preprocess_name", None)
        return TFLiteReID(p, **kwargs)
    if p.is_dir() and (p / "saved_model.pb").exists():
        kwargs.pop("half", None)
        kwargs.pop("preprocess_name", None)
        return SavedModelReID(p, **kwargs)
    if p.name == "manifest.txt" or (p.is_dir() and (p / "manifest.txt").exists()):
        # native C++ OSNet runtime (export_native_reid output; the
        # reference's cpp ReID backend, native/reid/capi.py)
        from boxmot_tpu.native.reid import CppReID

        return CppReID(p if p.name == "manifest.txt" else p / "manifest.txt")
    return ReID(weights=weights, **kwargs)
