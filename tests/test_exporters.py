"""Exporters: checkpoint roundtrip, torch state dict, tflite parity."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boxmot_tpu.models.osnet import build_osnet
from boxmot_tpu.reid import exporters as E

HW = (64, 32)


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_osnet("osnet_x0_25")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)))
    return model, jax.tree.map(np.asarray, variables)


def test_checkpoint_roundtrip(model_and_vars, tmp_path):
    model, variables = model_and_vars
    path = E.export_checkpoint(variables, tmp_path / "model.msgpack")
    back = E.load_checkpoint(variables, path)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, *HW, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, x)),
        np.asarray(model.apply(back, x)),
        atol=0,
    )


def test_torch_state_dict_export(model_and_vars, tmp_path):
    import torch

    _, variables = model_and_vars
    path = E.export_torch_state_dict(variables, tmp_path / "osnet.pt")
    ckpt = torch.load(path, weights_only=False)
    assert "state_dict" in ckpt
    assert "conv1.conv.weight" in ckpt["state_dict"]
    # reconvert to flax and verify identity
    from boxmot_tpu.models.convert import convert_osnet

    back = convert_osnet(str(path))
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["params"]),
        jax.tree_util.tree_leaves(back["params"]),
    ):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_tflite_export_and_parity(model_and_vars, tmp_path):
    model, variables = model_and_vars
    path = E.export_tflite(model, variables, tmp_path / "osnet.tflite", hw=HW)
    dev = E.verify_export(model, variables, path, hw=HW, atol=2e-2)
    assert dev < 2e-2


def test_tflite_dynamic_quant(model_and_vars, tmp_path):
    model, variables = model_and_vars
    path = E.export_tflite(
        model, variables, tmp_path / "osnet_q.tflite", hw=HW, quantize="dynamic"
    )
    x = np.random.default_rng(1).uniform(-1, 1, (1, *HW, 3)).astype(np.float32)
    out = E.run_tflite(path, x)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))
    # quantized outputs correlate strongly with the float reference
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98


def test_onnx_export_available():
    # export_onnx is no longer import-gated: the in-repo onnxlite
    # translator serializes the ModelProto itself (full coverage in
    # test_onnx_export.py)
    assert callable(E.export_onnx)


class TestRuntimeBackends:
    """Suffix-dispatched runtime backends produce interchangeable
    embeddings (reference reid/backends/ role)."""

    IMG = np.random.default_rng(3).integers(0, 255, (96, 128, 3)).astype(np.uint8)
    BOXES = np.array([[4.0, 6.0, 40.0, 80.0], [50.0, 10.0, 120.0, 90.0]], np.float32)

    @pytest.fixture(scope="class")
    def jax_reid(self):
        from boxmot_tpu.reid.core import ReID

        return ReID(model_name="osnet_x0_25", crop_hw=HW)

    def test_dispatch_model_name(self):
        from boxmot_tpu.reid.backends import create_reid
        from boxmot_tpu.reid.core import ReID

        assert isinstance(create_reid(model_name="osnet_x0_25", crop_hw=HW), ReID)

    def test_msgpack_dispatch_and_parity(self, jax_reid, tmp_path):
        from boxmot_tpu.reid.backends import create_reid

        path = E.export_checkpoint(jax_reid.variables, tmp_path / "osnet_x0_25.msgpack")
        reid2 = create_reid(weights=path, crop_hw=HW)
        ref = jax_reid.get_features(self.BOXES, self.IMG)
        got = reid2.get_features(self.BOXES, self.IMG)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_tflite_backend_parity(self, jax_reid, tmp_path):
        from boxmot_tpu.reid.backends import TFLiteReID, create_reid

        path = E.export_tflite(
            jax_reid.model, jax_reid.variables, tmp_path / "osnet_x0_25.tflite", hw=HW
        )
        backend = create_reid(weights=path, crop_hw=HW)
        assert isinstance(backend, TFLiteReID)
        assert backend.feature_dim == jax_reid.feature_dim
        ref = jax_reid.get_features(self.BOXES, self.IMG)
        got = backend.get_features(self.BOXES, self.IMG)
        assert got.shape == ref.shape
        # same crops, same weights, different runtime: embeddings agree
        np.testing.assert_allclose(got, ref, atol=2e-2)
        # L2 normalized
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-4)
        assert backend.get_features(np.zeros((0, 4)), self.IMG).shape == (0, backend.feature_dim)

    def test_saved_model_backend_parity(self, jax_reid, tmp_path):
        from boxmot_tpu.reid.backends import SavedModelReID, create_reid

        path = E.export_saved_model(
            jax_reid.model, jax_reid.variables, tmp_path / "osnet_sm", hw=HW
        )
        backend = create_reid(weights=path, crop_hw=HW)
        assert isinstance(backend, SavedModelReID)
        ref = jax_reid.get_features(self.BOXES, self.IMG)
        got = backend.get_features(self.BOXES, self.IMG)
        np.testing.assert_allclose(got, ref, atol=2e-2)
