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

    def test_ain_forward_and_roundtrip(self):
        from boxmot_tpu.models.convert import (
            convert_osnet_ain,
            export_osnet_ain_state_dict,
        )

        model = build_osnet("osnet_ain_x0_25")
        variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 32, 3)))
        out = np.asarray(
            model.apply(
                variables,
                jnp.asarray(RNG.uniform(-1, 1, (2, 64, 32, 3)), jnp.float32),
            )
        )
        assert out.shape == (2, 512) and np.isfinite(out).all()
        variables = jax.tree.map(np.asarray, variables)
        sd = export_osnet_ain_state_dict(variables)
        # osnet_ain.py naming: LightConvStream + pool transitions + INin
        assert "conv2.0.conv2.1.layers.0.conv1.weight" in sd
        assert "pool2.0.conv.weight" in sd
        assert "conv2.0.IN.weight" in sd
        assert "conv1.bn.running_mean" not in sd  # stem norm is IN
        back = convert_osnet_ain(sd)
        fa = jax.tree_util.tree_leaves_with_path(variables)
        fb = jax.tree_util.tree_leaves_with_path(back)
        assert len(fa) == len(fb)
        for (pa, va), (pb, vb) in zip(sorted(fa, key=str), sorted(fb, key=str)):
            assert str(pa) == str(pb)
            np.testing.assert_allclose(va, vb, atol=0)

    def test_ibn_forward_and_roundtrip(self):
        model = build_osnet("osnet_ibn_x1_0")
        variables = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 32, 3)))
        variables = jax.tree.map(np.asarray, variables)
        sd = export_osnet_state_dict(variables, ibn=True)
        assert "conv2.0.IN.weight" in sd  # stage-2 post-residual IN
        assert "conv3.0.IN.weight" not in sd  # only stage 2
        back = convert_osnet(sd, ibn=True)
        fa = jax.tree_util.tree_leaves_with_path(variables)
        fb = jax.tree_util.tree_leaves_with_path(back)
        assert len(fa) == len(fb)

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
        assert infer_model_name("osnet_ain_x1_0_msmt17.pt") == "osnet_ain_x1_0"
        assert infer_model_name("osnet_ibn_x1_0_market.pt") == "osnet_ibn_x1_0"
        assert infer_model_name("mobilenetv2_x1_4_duke.pt") == "mobilenetv2_x1_4"
        with pytest.raises(ValueError):
            infer_model_name("unknown_backbone_foo.pt")

    def test_vit_backbones(self):
        from boxmot_tpu.models.vit import build_vit
        from boxmot_tpu.reid.core import MODEL_FACTORY

        assert "vit_nano_ain_os" in MODEL_FACTORY and "vit_tiny_parts" in MODEL_FACTORY
        m = build_vit("vit_nano_ain_os")
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))
        out = np.asarray(
            m.apply(v, jnp.asarray(RNG.uniform(-1, 1, (2, 64, 32, 3)), jnp.float32))
        )
        assert out.shape == (2, 192) and np.isfinite(out).all()
        assert not np.allclose(out[0], out[1])
        # parts variant: (1 + num_parts) * feat_dim feature
        p = build_vit("vit_tiny_parts")
        vp = p.init(jax.random.PRNGKey(1), jnp.zeros((1, 96, 32, 3)))
        outp = p.apply(vp, jnp.zeros((2, 96, 32, 3)))
        assert outp.shape == (2, 3 * 512)
        assert p.feature_dim == 1536

    def test_lmbn_backbones(self):
        from boxmot_tpu.models.lmbn import build_lmbn
        from boxmot_tpu.reid.core import MODEL_FACTORY

        assert "lmbn_n" in MODEL_FACTORY and "lmbn_ain_n" in MODEL_FACTORY
        m = build_lmbn("lmbn_n")
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 64, 3)))
        out = np.asarray(
            m.apply(v, jnp.asarray(RNG.uniform(-1, 1, (2, 128, 64, 3)), jnp.float32))
        )
        assert out.shape == (2, 7 * 512)  # 7 BNNeck heads stacked
        assert np.isfinite(out).all()
        assert m.feature_dim == 3584

    def test_mlfn_and_cspreid(self):
        from boxmot_tpu.models.cspreid import build_cspreid
        from boxmot_tpu.models.mlfn import build_mlfn
        from boxmot_tpu.reid.core import MODEL_FACTORY

        assert "mlfn" in MODEL_FACTORY and "cspreid_n" in MODEL_FACTORY
        m = build_mlfn()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))
        out = m.apply(v, jnp.zeros((2, 64, 32, 3)))
        assert out.shape == (2, 1024) and m.feature_dim == 1024
        c = build_cspreid()
        vc = c.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 64, 3)))
        outc = c.apply(vc, jnp.zeros((2, 128, 64, 3)))
        assert outc.shape == (2, 1536) and c.feature_dim == 1536

    def test_csl_tinyvit(self):
        from boxmot_tpu.models.csl_tinyvit import build_csl_tinyvit
        from boxmot_tpu.reid.core import MODEL_FACTORY

        for name in ("csl_tinyvit_7m", "csl_tinyvit_lmbn", "csl_tinyvit_large"):
            assert name in MODEL_FACTORY
        m = build_csl_tinyvit("csl_tinyvit_7m")
        # small input: window padding path (grid not a multiple of 7/14)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64, 3)))
        out = np.asarray(
            m.apply(v, jnp.asarray(RNG.uniform(-1, 1, (2, 96, 64, 3)), jnp.float32))
        )
        assert out.shape == (2, 1536) and np.isfinite(out).all()
        assert not np.allclose(out[0], out[1])
        # aliases resolve to the same architecture
        assert build_csl_tinyvit("csl_tinyvit_small").embed_dims == m.embed_dims
        lm = build_csl_tinyvit("csl_tinyvit_7m_lmbn")
        assert lm.feature_dim == 7 * 512

    def test_hacnn(self):
        from boxmot_tpu.models.hacnn import build_hacnn
        from boxmot_tpu.reid.core import MODEL_FACTORY

        assert "hacnn" in MODEL_FACTORY
        m = build_hacnn()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 64, 3)))
        x = jnp.asarray(RNG.uniform(-1, 1, (2, 160, 64, 3)), jnp.float32)
        out = np.asarray(m.apply(v, x))
        assert out.shape == (2, 1024) and m.feature_dim == 1024
        # global/local halves are L2-normalized before concatenation
        np.testing.assert_allclose(np.linalg.norm(out[:, :512], axis=1), 1.0, atol=1e-4)
        with pytest.raises(AssertionError, match="160x64"):
            m.apply(v, jnp.zeros((1, 96, 64, 3)))

    def test_clip_reid(self):
        from boxmot_tpu.models.clip_reid import build_clip_reid
        from boxmot_tpu.reid.core import MODEL_FACTORY

        assert "clip" in MODEL_FACTORY
        m = build_clip_reid()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))
        out = np.asarray(
            m.apply(v, jnp.asarray(RNG.uniform(-1, 1, (2, 64, 32, 3)), jnp.float32))
        )
        assert out.shape == (2, 1280) and m.feature_dim == 1280  # 768 + 512
        assert np.isfinite(out).all()

    def test_factory_complete(self):
        # every name in the reference MODEL_FACTORY (factory.py:27-63)
        # must be constructible here
        from boxmot_tpu.reid.core import MODEL_FACTORY

        reference_names = [
            "resnet50", "resnet101", "mobilenetv2_x1_0", "mobilenetv2_x1_4",
            "hacnn", "mlfn",
            "osnet_x1_0", "osnet_x0_75", "osnet_x0_5", "osnet_x0_25",
            "osnet_ibn_x1_0",
            "osnet_ain_x1_0", "osnet_ain_x0_75", "osnet_ain_x0_5", "osnet_ain_x0_25",
            "lmbn_ain_n", "lmbn_n", "cspreid_n", "clip",
            "vit_nano", "vit_nano_ain", "vit_nano_ain_os",
            "vit_tiny", "vit_tiny_parts", "vit_tiny_parts3",
            "csl_tinyvit_7m", "csl_tinyvit_7m_lmbn",
            "csl_tinyvit_11m", "csl_tinyvit_11m_lmbn",
            "csl_tinyvit_23m", "csl_tinyvit_23m_lmbn",
            "csl_tinyvit_small", "csl_tinyvit_normal", "csl_tinyvit_large",
            "csl_tinyvit_lmbn",
        ]
        missing = [n for n in reference_names if n not in MODEL_FACTORY]
        assert not missing, f"missing factory entries: {missing}"

    def test_checkpoint_converter_dispatch(self):
        from boxmot_tpu.models.convert import convert_checkpoint

        with pytest.raises(ValueError, match="no checkpoint converter"):
            convert_checkpoint({}, "resnet50")


class TestMultiFrameBatching:
    """get_features_multi: several frames' crops in one device program
    (engine/generate.py frame_group; per-crop math identical)."""

    def test_matches_single_frame_path(self):
        import numpy as np

        from boxmot_tpu.reid.core import ReID

        r = ReID(model_name="osnet_x0_25")
        rng = np.random.default_rng(3)
        imgs = [rng.integers(0, 255, (240, 320, 3), np.uint8) for _ in range(3)]
        boxes = []
        for n in (4, 1, 6):
            b = rng.uniform(0, 200, (n, 4)).astype(np.float32)
            b[:, 2:] = b[:, :2] + 50
            boxes.append(b)
        multi = r.get_features_multi(boxes, imgs)
        for m, (b, i) in zip(multi, zip(boxes, imgs)):
            s = r.get_features(b, i)
            assert m.shape == s.shape
            cos = (m * s).sum(-1)
            assert cos.min() > 0.999, cos.min()

    def test_empty_and_single_frame_edges(self):
        import numpy as np

        from boxmot_tpu.reid.core import ReID

        r = ReID(model_name="osnet_x0_25")
        img = np.zeros((120, 160, 3), np.uint8)
        out = r.get_features_multi([np.zeros((0, 4), np.float32)], [img])
        assert len(out) == 1 and out[0].shape == (0, r.feature_dim)
        assert r.get_features_multi([], []) == []

    def test_generate_frame_group_cache_matches(self, tmp_path):
        """The emb cache written with frame_group=4 matches the
        per-frame cache row-for-row."""
        import numpy as np

        from boxmot_tpu.engine.generate import _fill_embeddings
        from boxmot_tpu.reid.core import ReID

        class _Seq:
            name = "S"
            img_paths = [f"f{i}.npy" for i in range(6)]
            seq_length = 6

        rng = np.random.default_rng(5)
        frames = {p: rng.integers(0, 255, (120, 160, 3), np.uint8)
                  for p in _Seq.img_paths}
        dets = []
        for i in range(6):
            n = [3, 0, 2, 5, 1, 4][i]
            b = rng.uniform(0, 100, (n, 6)).astype(np.float32)
            b[:, 2:4] = b[:, :2] + 30
            dets.append(b)
        import boxmot_tpu.engine.generate as gen
        orig = gen.load_frame
        gen.load_frame = lambda p: frames[str(p)]
        try:
            r = ReID(model_name="osnet_x0_25")
            p1 = tmp_path / "a.npy"
            p2 = tmp_path / "b.npy"
            _fill_embeddings(_Seq, dets, p1, r, frame_cache=False)
            _fill_embeddings(_Seq, dets, p2, r, frame_cache=False,
                             frame_group=4)
            a, b = np.load(p1), np.load(p2)
            assert a.shape == b.shape
            np.testing.assert_array_equal(a[:, 0], b[:, 0])  # frame col
            cos = (a[:, 1:] * b[:, 1:]).sum(-1)
            assert cos.min() > 0.999, cos.min()
        finally:
            gen.load_frame = orig
