"""ReID stack: crops op, OSNet forward, checkpoint conversion round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boxmot_tpu.models.convert import convert_osnet, export_osnet_state_dict
from boxmot_tpu.models.osnet import build_osnet
from boxmot_tpu.ops.crops import crop_resize_aabb, crop_resize_obb, extract_crops
from boxmot_tpu.reid.core import ReID, infer_model_name

RNG = np.random.default_rng(11)


class TestCrops:
    def test_identity_crop(self):
        # Cropping the full image at output size == input size is identity.
        img = RNG.uniform(0, 1, (32, 16, 3)).astype(np.float32)
        boxes = np.array([[0, 0, 16, 32]], np.float32)
        out = np.asarray(crop_resize_aabb(jnp.asarray(img), jnp.asarray(boxes), (32, 16)))
        np.testing.assert_allclose(out[0], img, atol=1e-5)

    def test_constant_region(self):
        img = np.zeros((64, 64, 3), np.float32)
        img[10:30, 20:40] = 0.7
        boxes = np.array([[22, 12, 38, 28]], np.float32)
        out = np.asarray(crop_resize_aabb(jnp.asarray(img), jnp.asarray(boxes), (8, 8)))
        np.testing.assert_allclose(out, 0.7, atol=1e-5)

    def test_downscale_average(self):
        # 2x2 checkerboard downscaled to 1x1 samples the center.
        img = np.zeros((2, 2, 1), np.float32)
        img[0, 0] = img[1, 1] = 1.0
        boxes = np.array([[0, 0, 2, 2]], np.float32)
        out = np.asarray(crop_resize_aabb(jnp.asarray(img), jnp.asarray(boxes), (1, 1)))
        np.testing.assert_allclose(out[0, 0, 0], 0.5, atol=1e-5)

    def test_obb_crop_axis_aligned_matches_aabb(self):
        img = RNG.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        aabb = np.array([[10, 20, 40, 50]], np.float32)
        obb = np.array([[25, 35, 30, 30, 0.0]], np.float32)
        a = np.asarray(crop_resize_aabb(jnp.asarray(img), jnp.asarray(aabb), (16, 16)))
        o = np.asarray(crop_resize_obb(jnp.asarray(img), jnp.asarray(obb), (16, 16)))
        np.testing.assert_allclose(a, o, atol=1e-4)

    def test_obb_rotation(self):
        # Vertical stripe; rotated crop by 90 deg must see a horizontal stripe.
        img = np.zeros((64, 64, 1), np.float32)
        img[:, 30:34] = 1.0
        obb = np.array([[32, 32, 20, 20, np.pi / 2]], np.float32)
        out = np.asarray(crop_resize_obb(jnp.asarray(img), jnp.asarray(obb), (20, 20)))
        # stripe now spans rows, constant across columns
        row_var = out[0, :, :, 0].std(axis=1).mean()
        assert row_var < 0.05

    def test_extract_crops_standardized(self):
        img = np.full((32, 32, 3), 127, np.uint8)
        boxes = np.array([[4, 4, 28, 28]], np.float32)
        out = np.asarray(extract_crops(jnp.asarray(img), jnp.asarray(boxes), (8, 8)))
        expect = (127 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )
        np.testing.assert_allclose(out[0, 0, 0], expect, atol=1e-4)


class TestOSNet:
    def test_forward_shapes(self):
        model = build_osnet("osnet_x0_25")
        x = jnp.zeros((2, 256, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 512)

    def test_distinct_inputs_distinct_features(self):
        model = build_osnet("osnet_x0_25")
        x = jnp.asarray(RNG.uniform(-1, 1, (2, 64, 32, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(1), x)
        out = np.asarray(model.apply(variables, x))
        assert np.all(np.isfinite(out))
        assert not np.allclose(out[0], out[1])

    def test_conversion_roundtrip(self):
        model = build_osnet("osnet_x0_25")
        x = jnp.zeros((1, 64, 32, 3))
        variables = model.init(jax.random.PRNGKey(2), x)
        variables = jax.tree.map(np.asarray, variables)
        sd = export_osnet_state_dict(variables)
        # state dict keys look like torchreid keys
        assert "conv1.conv.weight" in sd
        assert "conv2.0.conv2a.bn.running_mean" in sd
        assert "conv2.2.0.conv.weight" in sd  # transition
        assert "fc.0.weight" in sd and "fc.1.running_var" in sd
        back = convert_osnet(sd)
        flat_a = jax.tree_util.tree_leaves_with_path(variables)
        flat_b = jax.tree_util.tree_leaves_with_path(back)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str), sorted(flat_b, key=str)):
            assert str(pa) == str(pb)
            np.testing.assert_allclose(va, vb, atol=0, err_msg=str(pa))
        # converted weights produce identical outputs
        xa = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 32, 3)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(model.apply(variables, xa)),
            np.asarray(model.apply(back, xa)),
            atol=1e-6,
        )

    def test_unmapped_keys_rejected(self):
        model = build_osnet("osnet_x0_25")
        variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 32, 3)))
        sd = export_osnet_state_dict(jax.tree.map(np.asarray, variables))
        sd["bogus.weight"] = np.zeros(3)
        with pytest.raises(ValueError, match="unmapped"):
            convert_osnet(sd)


class TestReIDFacade:
    def test_get_features_contract(self):
        reid = ReID(model_name="osnet_x0_25", crop_hw=(64, 32))
        img = RNG.integers(0, 255, (240, 320, 3)).astype(np.uint8)
        boxes = np.array(
            [[10, 10, 60, 120], [100, 40, 160, 200], [200, 30, 240, 130]], np.float32
        )
        feats = reid.get_features(boxes, img)
        assert feats.shape == (3, 512)
        norms = np.linalg.norm(feats, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_empty_boxes(self):
        reid = ReID(model_name="osnet_x0_25", crop_hw=(64, 32))
        img = np.zeros((100, 100, 3), np.uint8)
        feats = reid.get_features(np.zeros((0, 4), np.float32), img)
        assert feats.shape == (0, 512)

    def test_same_box_same_feature(self):
        reid = ReID(model_name="osnet_x0_25", crop_hw=(64, 32))
        img = RNG.integers(0, 255, (240, 320, 3)).astype(np.uint8)
        b = np.array([[10, 10, 60, 120]], np.float32)
        f1 = reid.get_features(b, img)
        f2 = reid.get_features(np.repeat(b, 2, axis=0), img)
        np.testing.assert_allclose(f1[0], f2[0], atol=1e-5)
        np.testing.assert_allclose(f2[0], f2[1], atol=1e-5)

    def test_infer_model_name(self):
        assert infer_model_name("/x/osnet_x0_25_msmt17.pt") == "osnet_x0_25"
        assert infer_model_name("osnet_x1_0_market.pth") == "osnet_x1_0"
        assert infer_model_name("resnet50_msmt17.pt") == "resnet50"
        with pytest.raises(ValueError):
            infer_model_name("unknown_backbone_foo.pt")
