"""Native ReID runtime: C++ OSNet parity vs the device (flax) model."""

import numpy as np
import pytest

from boxmot_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)

BOXES = np.array(
    [[20, 30, 120, 200], [100, 50, 200, 230], [0, 0, 50, 80]], np.float32
)


def _img(seed=0, hw=(240, 320)):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (*hw, 3), np.uint8)


@pytest.mark.parametrize("variant", ["osnet_x0_25", "osnet_ain_x0_25"])
def test_feature_parity(tmp_path, variant):
    """C++ embeddings match the flax model on random weights."""
    from boxmot_tpu.native.reid import CppReID, export_native_reid
    from boxmot_tpu.reid.core import ReID

    reid = ReID(model_name=variant)
    manifest = export_native_reid(variant, reid.variables, tmp_path / variant)
    cpp = CppReID(manifest)
    assert cpp.feature_dim == reid.feature_dim == 512

    img = _img()
    f_jax = reid.get_features(BOXES, img)
    f_cpp = cpp.get_features(BOXES, img)
    assert f_cpp.shape == f_jax.shape
    # embeddings are L2-normalized; compare by cosine similarity
    cos = np.sum(f_jax * f_cpp, axis=1)
    assert np.all(cos > 0.999), cos
    np.testing.assert_allclose(f_cpp, f_jax, atol=5e-3)


def test_empty_and_errors(tmp_path):
    from boxmot_tpu.native.reid import CppReID, export_native_reid
    from boxmot_tpu.reid.core import ReID

    with pytest.raises(RuntimeError):
        CppReID(tmp_path / "nope" / "manifest.txt")

    reid = ReID(model_name="osnet_x0_25")
    manifest = export_native_reid("osnet_x0_25", reid.variables, tmp_path / "m")
    cpp = CppReID(manifest)
    out = cpp.get_features(np.empty((0, 4), np.float32), _img())
    assert out.shape == (0, 512)


def test_backend_dispatch(tmp_path):
    """create_reid routes manifest paths to the native runtime."""
    from boxmot_tpu.native.reid import CppReID, export_native_reid
    from boxmot_tpu.reid.backends import create_reid
    from boxmot_tpu.reid.core import ReID

    reid = ReID(model_name="osnet_x0_25")
    export_native_reid("osnet_x0_25", reid.variables, tmp_path / "m")
    for target in (tmp_path / "m", tmp_path / "m" / "manifest.txt"):
        backend = create_reid(weights=target)
        assert isinstance(backend, CppReID)
        assert backend.feature_dim == 512


def test_export_rejects_non_osnet(tmp_path):
    from boxmot_tpu.native.reid import export_native_reid

    with pytest.raises(ValueError):
        export_native_reid("resnet50", {}, tmp_path)
