"""ReID model exporters.

Counterpart of the reference exporter zoo (boxmot/reid/exporters/*.py:
torchscript / onnx / openvino / tensorrt / tflite) for Flax models:

  * checkpoint      — flax msgpack serialization (native format)
  * torch state dict — torchreid-compatible .pt via models.convert
  * SavedModel / TFLite — through jax2tf, with optional dynamic-range or
    int8 quantization (the reference tflite path, tflite_exporter.py)
  * onnx            — opset-17 ModelProto via the in-repo jaxpr
    translator (boxmot_tpu/onnxlite), verified by an independent
    evaluator (onnxruntime when importable, onnxlite.run_onnx here)

Every export path has a parity verifier mirroring the reference's
exported-vs-source output check (engine/reid/export.py:260-270).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def export_checkpoint(variables, path: Path) -> Path:
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(variables))
    return path


def load_checkpoint(variables_template, path: Path):
    from flax import serialization

    return serialization.from_bytes(variables_template, Path(path).read_bytes())


def export_torch_state_dict(variables, path: Path, blocks=(2, 2, 2)) -> Path:
    """torchreid-format .pt for interop with the reference runtimes."""
    import torch

    from boxmot_tpu.models.convert import export_osnet_state_dict

    sd = export_osnet_state_dict(variables, blocks=blocks)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, path)
    return path


def _tf_function(model, variables, hw):
    import tensorflow as tf
    from jax.experimental import jax2tf

    def fwd(x):
        return model.apply(variables, x, train=False)

    tf_fn = jax2tf.convert(fwd, enable_xla=False)
    return tf.function(
        tf_fn,
        input_signature=[tf.TensorSpec((1, hw[0], hw[1], 3), tf.float32)],
        autograph=False,
    )


def export_saved_model(model, variables, path: Path, hw=(256, 128)) -> Path:
    import tensorflow as tf

    path = Path(path)
    module = tf.Module()
    module.fwd = _tf_function(model, variables, hw)
    tf.saved_model.save(module, str(path))
    return path


def export_tflite(
    model,
    variables,
    path: Path,
    hw=(256, 128),
    quantize: str | None = None,
    representative_batches=None,
) -> Path:
    """quantize: None (float32), "dynamic", or "int8" (needs
    representative_batches: iterable of (1, H, W, 3) float arrays)."""
    import tensorflow as tf

    fn = _tf_function(model, variables, hw)
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [fn.get_concrete_function()]
    )
    if quantize in ("dynamic", "int8"):
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    if quantize == "int8":
        if representative_batches is None:
            raise ValueError("int8 quantization needs representative_batches")

        def rep():
            for batch in representative_batches:
                yield [np.asarray(batch, np.float32)]

        converter.representative_dataset = rep
    blob = converter.convert()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    return path


def export_onnx(model, variables, path: Path, hw=(256, 128), batch: int = 1) -> Path:
    """ONNX (opset 17) via the in-repo jaxpr translator.

    The reference exports through torch.onnx
    (boxmot/reid/exporters/onnx_exporter.py:18-87); neither torch.onnx
    (flax models) nor the onnx package applies here, so onnxlite
    traces the flax forward to a jaxpr and serializes the ModelProto
    itself.  Shapes are static at the given batch size; input/output
    names match the reference's ("images" / "features")."""
    import jax.numpy as jnp

    from boxmot_tpu.onnxlite import export_fn_to_onnx

    x = jnp.zeros((batch, hw[0], hw[1], 3), jnp.float32)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    export_fn_to_onnx(
        lambda inp: model.apply(variables, inp, train=False),
        [x],
        path,
        input_names=["images"],
        output_names=["features"],
        graph_name=f"boxmot_tpu_{path.stem}",
    )
    return path


def run_onnx_export(path: Path, x: np.ndarray) -> np.ndarray:
    """Execute an exported .onnx: onnxruntime when importable, the
    in-repo onnxlite evaluator otherwise."""
    try:
        import onnxruntime as ort

        sess = ort.InferenceSession(str(path), providers=["CPUExecutionProvider"])
        return sess.run(None, {"images": np.asarray(x, np.float32)})[0]
    except ImportError:
        from boxmot_tpu.onnxlite import run_onnx

        return run_onnx(path, [np.asarray(x, np.float32)])[0]


def run_tflite(path: Path, x: np.ndarray) -> np.ndarray:
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=str(path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], np.asarray(x, np.float32))
    interp.invoke()
    return interp.get_tensor(out["index"])


def verify_export(model, variables, path: Path, hw=(256, 128), atol=1e-3) -> float:
    """Max abs deviation between the source model and the exported tflite
    artifact on a fixed probe input; raises if above atol."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, hw[0], hw[1], 3)).astype(np.float32)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = run_tflite(path, x)
    dev = float(np.abs(ref - got).max())
    if dev > atol:
        raise AssertionError(f"export parity failure: max deviation {dev} > {atol}")
    return dev


def run_export(
    weights=None,
    model_name: str = "osnet_x0_25",
    include=("tflite",),
    out_dir="exports",
    hw=(256, 128),
    quantize: str | None = None,
    verify: bool = True,
) -> dict:
    """Orchestrated multi-target export (reference engine/reid/export.py:
    260-270 run_export + parity verification).  Returns
    {target: {"path": ..., "max_dev": ...}}."""
    from boxmot_tpu.reid.core import ReID

    reid = ReID(weights=weights, model_name=None if weights else model_name,
                crop_hw=hw)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    stem = reid.model_name
    results = {}
    for target in include:
        info = {}
        if target == "checkpoint":
            info["path"] = export_checkpoint(reid.variables, out / f"{stem}.msgpack")
        elif target == "torch":
            info["path"] = export_torch_state_dict(reid.variables, out / f"{stem}.pt")
        elif target == "saved_model":
            info["path"] = export_saved_model(
                reid.model, reid.variables, out / f"{stem}_saved", hw=hw
            )
        elif target == "onnx":
            info["path"] = export_onnx(
                reid.model, reid.variables, out / f"{stem}.onnx", hw=hw
            )
            if verify:
                rng = np.random.default_rng(0)
                x = rng.uniform(-1, 1, (1, hw[0], hw[1], 3)).astype(np.float32)
                ref = np.asarray(reid.model.apply(reid.variables, x, train=False))
                got = run_onnx_export(info["path"], x)
                info["max_dev"] = float(np.abs(ref - got).max())
                if info["max_dev"] > 5e-3:
                    raise AssertionError(
                        f"onnx export parity failure: {info['max_dev']}"
                    )
        elif target == "tflite":
            info["path"] = export_tflite(
                reid.model, reid.variables, out / f"{stem}.tflite", hw=hw,
                quantize=quantize,
            )
            if verify:
                info["max_dev"] = verify_export(
                    reid.model, reid.variables, info["path"], hw=hw, atol=5e-3
                )
        else:
            raise ValueError(
                f"unknown export target {target!r}; choose from "
                "checkpoint,torch,saved_model,tflite,onnx"
            )
        results[target] = info
    from boxmot_tpu.engine.results import ExportResult

    return ExportResult(results)
