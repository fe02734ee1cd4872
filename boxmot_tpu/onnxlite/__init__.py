"""Dependency-free ONNX export for JAX/Flax models.

The reference ships an ONNX exporter built on torch.onnx
(boxmot/reid/exporters/onnx_exporter.py) and serves the exported
models from ONNXRuntime.  Neither the `onnx` package nor a converter
toolchain (tf2onnx, torch.onnx for flax) exists in this environment,
so this package implements the path natively:

- proto.py    — ONNX's protobuf wire format, encoded/decoded by hand
                (the format is stable and tiny: varints + length-
                delimited submessages; field numbers from onnx.proto).
- builder.py  — GraphBuilder: nodes, initializers, value infos →
                serialized ModelProto bytes.
- export.py   — the actual converter: traces a jittable function to a
                jaxpr and translates each primitive to ONNX ops
                (opset 17), constant-folding anything static.
- runtime.py  — a numpy evaluator for the emitted op subset, used to
                verify exports offline; when the real `onnx` /
                `onnxruntime` packages are importable the tests also
                run checker + ORT against the same files.
"""

from boxmot_tpu.onnxlite.export import export_fn_to_onnx  # noqa: F401
from boxmot_tpu.onnxlite.runtime import run_onnx  # noqa: F401
