"""Native (C++) ReID: weight export + ctypes inference backend.

Mirror of the reference's ReID C ABI
(boxmot/native/cpp/trackers/base/reid_capi.h:37-90 and the ctypes
wrapper boxmot/native/reid/capi.py): crops + embeddings computed fully
in native code for hosts without a TPU/JAX runtime.  Where the
reference wraps ONNXRuntime, this backend runs a hand-coded C++ OSNet
(native/cpp/src/reid_net.hpp) over weights exported from the flax
model — BatchNorm folded to affine at export, identical crop grid and
ImageNet standardization (boxmot_tpu/ops/crops.py).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

from boxmot_tpu.native import get_library
from boxmot_tpu.models.osnet import OSNET_VARIANTS, build_osnet

_BN_EPS = 1e-5


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def export_native_reid(
    model_name: str, variables, out_dir: Path | str, crop_hw=(256, 128)
) -> Path:
    """Write manifest.txt + weights.bin for the C++ OSNet runtime.

    BatchNorm (params scale/bias + batch_stats mean/var) folds into one
    affine pair a = scale/sqrt(var+eps), b = bias - mean*a; instance
    norms keep their affine params and normalize at runtime.  Supported
    families: OSNet variants and LMBN (lmbn_n / lmbn_ain_n — the
    benchmark ReID; reference native serves it via ONNXRuntime,
    reid_onnx.cpp:383).
    """
    is_lmbn = model_name in ("lmbn_n", "lmbn_ain_n")
    if model_name not in OSNET_VARIANTS and not is_lmbn:
        raise ValueError(
            "native ReID export supports the OSNet and LMBN families, "
            f"not {model_name!r}"
        )
    if is_lmbn:
        from boxmot_tpu.models.lmbn import build_lmbn

        model = build_lmbn(model_name)
    else:
        model = build_osnet(model_name)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    variables = dict(variables)
    params = _flatten(variables.get("params", {}))
    stats = _flatten(variables.get("batch_stats", {}))

    tensors: dict[str, np.ndarray] = {}
    bn_prefixes = set()
    for name in stats:
        if name.endswith("/mean"):
            bn_prefixes.add(name[: -len("/mean")])
    for prefix in bn_prefixes:
        mean = stats[f"{prefix}/mean"].astype(np.float64)
        var = stats[f"{prefix}/var"].astype(np.float64)
        # BNNeck BatchNorms freeze the bias at 0 (use_bias=False)
        scale = params.get(f"{prefix}/scale", np.ones_like(mean)).astype(np.float64)
        bias = params.get(f"{prefix}/bias", np.zeros_like(mean)).astype(np.float64)
        a = scale / np.sqrt(var + _BN_EPS)
        tensors[f"{prefix}/a"] = a.astype(np.float32)
        tensors[f"{prefix}/b"] = (bias - mean * a).astype(np.float32)
    for name, arr in params.items():
        prefix, _, leaf = name.rpartition("/")
        if prefix in bn_prefixes and leaf in ("scale", "bias"):
            continue  # folded above
        tensors[name] = arr.astype(np.float32)

    blob = bytearray()
    if is_lmbn:
        lines = [
            "bmtnn 1",
            "arch lmbn",
            f"channels {','.join(map(str, model.channels))}",
            "blocks 2,2,2",  # osnet x1_0 trunk layout (unused by lmbn fwd)
            f"feature_dim {model.feature_dim}",
            f"ain {int(model.ain)}",
            "conv1_in 0",
            "ibn 0",
            f"crop {crop_hw[0]} {crop_hw[1]}",
        ]
    else:
        lines = [
            "bmtnn 1",
            "arch osnet",
            f"channels {','.join(map(str, model.channels))}",
            f"blocks {','.join(map(str, model.blocks))}",
            f"feature_dim {model.feature_dim}",
            "block_types " + ";".join(",".join(b) for b in model.block_types),
            f"conv1_in {int(model.conv1_in)}",
            f"ibn {int(model.ibn)}",
            f"crop {crop_hw[0]} {crop_hw[1]}",
        ]
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name], np.float32)
        offset = len(blob) // 4
        blob.extend(arr.tobytes())
        shape = ",".join(map(str, arr.shape)) if arr.ndim else "1"
        lines.append(f"tensor {name} {shape} {offset}")
    (out_dir / "weights.bin").write_bytes(bytes(blob))
    (out_dir / "manifest.txt").write_text("\n".join(lines) + "\n")
    return out_dir / "manifest.txt"


_BOUND = False


def _bind(lib):
    global _BOUND
    if _BOUND:
        return
    lib.bmt_reid_create.restype = ctypes.c_void_p
    lib.bmt_reid_create.argtypes = [ctypes.c_char_p]
    lib.bmt_reid_destroy.argtypes = [ctypes.c_void_p]
    lib.bmt_reid_feature_dim.argtypes = [ctypes.c_void_p]
    lib.bmt_reid_compute.restype = ctypes.c_int
    lib.bmt_reid_compute.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.bmt_reid_last_error.restype = ctypes.c_char_p
    _BOUND = True


class CppReID:
    """ctypes ReID backend with the reference get_features contract
    (boxmot/native/reid/capi.py CppOnnxReID)."""

    def __init__(self, manifest: Path | str):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        _bind(lib)
        self._lib = lib
        self._handle = lib.bmt_reid_create(str(manifest).encode())
        if not self._handle:
            raise RuntimeError(lib.bmt_reid_last_error().decode())
        self.feature_dim = lib.bmt_reid_feature_dim(self._handle)
        self.model_name = "osnet(native)"

    def get_features(self, xyxys: np.ndarray, img: np.ndarray) -> np.ndarray:
        xyxys = np.ascontiguousarray(np.asarray(xyxys, np.float32)[:, :4])
        n = len(xyxys)
        if n == 0:
            return np.zeros((0, self.feature_dim), np.float32)
        img = np.ascontiguousarray(img, np.uint8)
        out = np.empty((n, self.feature_dim), np.float32)
        rc = self._lib.bmt_reid_compute(
            self._handle,
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            img.shape[0],
            img.shape[1],
            xyxys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(self._lib.bmt_reid_last_error().decode())
        return out

    def __call__(self, xyxys, img):
        return self.get_features(xyxys, img)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.bmt_reid_destroy(handle)
            self._handle = None
