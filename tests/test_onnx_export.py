"""ONNX export (boxmot_tpu/onnxlite) tests.

Parity methodology: the exporter (jaxpr -> ModelProto writer) and the
verifier (wire-format decoder -> numpy/torch evaluator) are separate
implementations of the ONNX spec, so a wiring/attribute/weight-layout
bug in the exporter shows up as a numeric mismatch here rather than
being self-consistent.  When the real onnx / onnxruntime packages are
importable the same bytes additionally go through checker + ORT
(test_real_onnx_toolchain_if_available).

Reference surface being matched: boxmot/reid/exporters/onnx_exporter.py
(torch.onnx -> .onnx with images/features IO names).
"""

import numpy as np
import pytest


def _cos_rows(a, b):
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    return num / den


class TestWireFormat:
    def test_roundtrip_graph(self):
        from boxmot_tpu.onnxlite.builder import GraphBuilder
        from boxmot_tpu.onnxlite.runtime import decode_model

        b = GraphBuilder("g")
        b.add_input("x", [2, 3], np.float32)
        w = b.constant(np.arange(6, dtype=np.float32).reshape(2, 3), "w")
        y = b.node("Add", ["x", w])
        b.node("Identity", [y], outputs=["y"])
        b.add_output("y", [2, 3], np.float32)
        blob = b.serialize()
        nodes, inits, ins, outs = decode_model(blob)
        assert ins == ["x"] and outs == ["y"]
        assert [n.op for n in nodes] == ["Add", "Identity"]
        np.testing.assert_array_equal(
            inits[w], np.arange(6, dtype=np.float32).reshape(2, 3)
        )

    def test_negative_and_large_varints(self):
        from boxmot_tpu.onnxlite import proto as P

        for v in (0, 1, 127, 128, 2**35, -1, -(2**31)):
            enc = P.write_varint(v)
            dec, pos = P.read_varint(enc, 0)
            assert pos == len(enc)
            assert P.to_signed64(dec) == v

    def test_attribute_kinds(self):
        from boxmot_tpu.onnxlite.builder import GraphBuilder
        from boxmot_tpu.onnxlite.runtime import decode_model

        b = GraphBuilder()
        b.add_input("x", [1], np.float32)
        b.node(
            "Fake",
            ["x"],
            outputs=["y"],
            ints=[1, 2, 3],
            i=7,
            f=0.5,
            s="hello",
        )
        b.add_output("y", [1], np.float32)
        nodes, _, _, _ = decode_model(b.serialize())
        a = nodes[0].attrs
        assert a["ints"] == [1, 2, 3] and a["i"] == 7 and a["s"] == "hello"
        assert abs(a["f"] - 0.5) < 1e-7


class TestFunctionExport:
    def test_elementwise_and_softmax(self):
        import jax
        import jax.numpy as jnp

        from boxmot_tpu.onnxlite import export_fn_to_onnx, run_onnx

        def f(x):
            y = jnp.tanh(x) * 2.0 + x[:, :1]
            y = jnp.where(y > 0, y, 0.1 * y)
            return jax.nn.softmax(y, axis=-1)

        x = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
        blob = export_fn_to_onnx(f, [jnp.asarray(x)])
        out = run_onnx(blob, [x])[0]
        np.testing.assert_allclose(out, np.asarray(f(jnp.asarray(x))), atol=1e-6)

    def test_conv_pool_dense(self):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from boxmot_tpu.onnxlite import export_fn_to_onnx, run_onnx

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), strides=2, padding=[(1, 1), (1, 1)])(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.Conv(8, (3, 3), padding="SAME", feature_group_count=8)(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                x = x.mean(axis=(1, 2))
                return nn.Dense(5)(x)

        m = Tiny()
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 32, 16, 3), jnp.float32)
        variables = m.init(rng, x)
        fn = lambda inp: m.apply(variables, inp)
        blob = export_fn_to_onnx(fn, [x])
        out = run_onnx(blob, [np.asarray(x)])[0]
        np.testing.assert_allclose(out, np.asarray(fn(x)), atol=1e-5)

    def test_layernorm_attention_block(self):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from boxmot_tpu.onnxlite import export_fn_to_onnx, run_onnx

        class Block(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = nn.LayerNorm()(x)
                y = nn.SelfAttention(num_heads=2, qkv_features=16)(y)
                return x + y

        m = Block()
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (2, 7, 16), jnp.float32)
        variables = m.init(rng, x)
        fn = lambda inp: m.apply(variables, inp)
        blob = export_fn_to_onnx(fn, [x])
        out = run_onnx(blob, [np.asarray(x)])[0]
        np.testing.assert_allclose(out, np.asarray(fn(x)), atol=1e-5)


class TestModelExport:
    def _export_and_check(self, model, variables, hw, atol=5e-5):
        import jax.numpy as jnp

        from boxmot_tpu.onnxlite import export_fn_to_onnx, run_onnx

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (2, hw[0], hw[1], 3)).astype(np.float32)
        fn = lambda inp: model.apply(variables, inp, train=False)
        blob = export_fn_to_onnx(
            fn, [jnp.asarray(x)], input_names=["images"], output_names=["features"]
        )
        ref = np.asarray(fn(jnp.asarray(x)))
        out = run_onnx(blob, [x])[0]
        assert out.shape == ref.shape
        assert _cos_rows(out, ref).min() > 0.999
        np.testing.assert_allclose(out, ref, atol=atol)
        return blob

    def test_osnet_small_crop(self):
        import jax

        from boxmot_tpu.models.osnet import build_osnet

        model = build_osnet("osnet_x0_25")
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, np.zeros((1, 64, 32, 3), np.float32))
        self._export_and_check(model, variables, (64, 32))

    @pytest.mark.slow
    def test_lmbn_benchmark_reid(self):
        import jax

        from boxmot_tpu.models.lmbn import build_lmbn

        model = build_lmbn("lmbn_n")
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, np.zeros((1, 256, 128, 3), np.float32))
        self._export_and_check(model, variables, (256, 128), atol=5e-4)

    def test_run_export_onnx_target(self, tmp_path):
        from boxmot_tpu.reid.exporters import run_export

        res = run_export(
            model_name="osnet_x0_25",
            include=("onnx",),
            out_dir=tmp_path,
            hw=(64, 32),
        )
        info = res["onnx"]
        assert info["path"].exists()
        assert info["max_dev"] < 5e-3

    def test_real_onnx_toolchain_if_available(self, tmp_path):
        onnx = pytest.importorskip("onnx")
        import jax

        from boxmot_tpu.models.osnet import build_osnet
        from boxmot_tpu.reid.exporters import export_onnx

        model = build_osnet("osnet_x0_25")
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, np.zeros((1, 64, 32, 3), np.float32))
        path = export_onnx(model, variables, tmp_path / "m.onnx", hw=(64, 32))
        m = onnx.load(str(path))
        onnx.checker.check_model(m)
        try:
            import onnxruntime as ort
        except ImportError:
            return
        sess = ort.InferenceSession(str(path), providers=["CPUExecutionProvider"])
        x = np.random.default_rng(0).uniform(-1, 1, (1, 64, 32, 3)).astype(np.float32)
        got = sess.run(None, {"images": x})[0]
        ref = np.asarray(model.apply(variables, x, train=False))
        np.testing.assert_allclose(got, ref, atol=1e-4)
