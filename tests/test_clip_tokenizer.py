"""CLIP BPE tokenizer + pretrained text-tower conversion tests.

Differential parity runs the ACTUAL reference tokenizer
(boxmot/reid/backbones/clip/clip/simple_tokenizer.py) in-process (ftfy
stubbed as identity — exact for ASCII) against ours; conversion is
checked against a from-scratch numpy oracle of the CLIP text
transformer semantics (clip/model.py Transformer + ln_final +
text_projection at the EOT position).
"""

import importlib.util
import random
import string
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.models.clip_tokenizer import (
    CONTEXT_LENGTH,
    ClipBPE,
    get_tokenizer,
    tokenize,
)

REF_TOKENIZER = Path(
    "/root/reference/boxmot/reid/backbones/clip/clip/simple_tokenizer.py"
)

TEXTS = [
    "A photo of a X X X X person.",
    "A photo of a X X X X vehicle.",
    "hello world!!! don't stop; 1234 cafe élève",
    "CLIP-ReID prompt learning, stage 1 (frozen text tower)",
    "ña 漢字 emoji 😀 mixed",
    "  spaced\t\tout\n\ntext  ",
    "'s 't 're 've 'm 'll 'd contractions",
    "",
]


def _load_reference_tokenizer():
    if not REF_TOKENIZER.exists():
        pytest.skip("reference tree unavailable")
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            stub = types.ModuleType("ftfy")
            stub.fix_text = lambda t: t  # identity: ASCII fixtures
            sys.modules["ftfy"] = stub
    if "boxmot.utils" not in sys.modules:
        pkg = sys.modules.setdefault("boxmot", types.ModuleType("boxmot"))
        utils = types.ModuleType("boxmot.utils")
        utils.BOXMOT = REF_TOKENIZER.parents[4]
        pkg.utils = utils
        sys.modules["boxmot.utils"] = utils
    spec = importlib.util.spec_from_file_location("_ref_clip_tok", REF_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer()


class TestTokenizerParity:
    def test_fixture_texts_match_reference(self):
        ref = _load_reference_tokenizer()
        mine = get_tokenizer()
        for text in TEXTS:
            assert ref.encode(text) == mine.encode(text), text

    def test_fuzz_matches_reference(self):
        ref = _load_reference_tokenizer()
        mine = get_tokenizer()
        rng = random.Random(7)
        for _ in range(50):
            text = "".join(
                rng.choices(string.printable + "éüñ中🙂", k=rng.randint(1, 60))
            )
            assert ref.encode(text) == mine.encode(text), repr(text)

    def test_vocab_and_specials(self):
        ref = _load_reference_tokenizer()
        mine = get_tokenizer()
        assert mine.vocab_size == len(ref.encoder) == 49408
        assert mine.sot == 49406 and mine.eot == 49407


class TestTokenize:
    def test_template_ids(self):
        # canonical CLIP ids for the CLIP-ReID template
        row = tokenize("A photo of a X X X X person.")[0]
        assert row.shape == (CONTEXT_LENGTH,)
        assert row[0] == 49406 and row[11] == 49407
        assert list(row[1:5]) == [320, 1125, 539, 320]  # "a photo of a"
        assert list(row[5:9]) == [343] * 4  # X X X X
        assert not row[12:].any()

    def test_decode_roundtrip(self):
        tok = get_tokenizer()
        assert tok.decode(tok.encode("hello world, person.")).strip() == (
            "hello world , person ."
        )

    def test_truncate_semantics(self):
        long = "word " * 50
        with pytest.raises(ValueError):
            tokenize(long, context_length=10)
        row = tokenize(long, context_length=10, truncate=True)[0]
        assert row.shape == (10,) and row[0] == 49406 and row[-1] == 49407

    def test_batch_shape(self):
        arr = tokenize(["a person", "a vehicle", "a"])
        assert arr.shape == (3, CONTEXT_LENGTH) and arr.dtype == np.int32

    def test_custom_vocab_path(self):
        from boxmot_tpu.models.clip_tokenizer import VOCAB_PATH

        tok = ClipBPE(VOCAB_PATH)
        assert tok.encode("person") == [2533]


# ---------------------------------------------------------------------------
# convert_clip: synthetic OpenAI-format checkpoints
# ---------------------------------------------------------------------------

VW, VL, VH, P = 64, 2, 2, 16  # visual width/layers/heads/patch
TW, TL, TH = 32, 2, 2  # text width/layers/heads
EMB, VOCAB, CTX = 16, 49408, 20  # real vocab size: template ids must index


def _block_sd(rng, prefix, width):
    sd = {}
    for i in range(2):
        b = f"{prefix}transformer.resblocks.{i}"
        sd[f"{b}.ln_1.weight"] = rng.normal(1, 0.02, width)
        sd[f"{b}.ln_1.bias"] = rng.normal(0, 0.02, width)
        sd[f"{b}.ln_2.weight"] = rng.normal(1, 0.02, width)
        sd[f"{b}.ln_2.bias"] = rng.normal(0, 0.02, width)
        sd[f"{b}.attn.in_proj_weight"] = rng.normal(0, 0.05, (3 * width, width))
        sd[f"{b}.attn.in_proj_bias"] = rng.normal(0, 0.02, 3 * width)
        sd[f"{b}.attn.out_proj.weight"] = rng.normal(0, 0.05, (width, width))
        sd[f"{b}.attn.out_proj.bias"] = rng.normal(0, 0.02, width)
        sd[f"{b}.mlp.c_fc.weight"] = rng.normal(0, 0.05, (4 * width, width))
        sd[f"{b}.mlp.c_fc.bias"] = rng.normal(0, 0.02, 4 * width)
        sd[f"{b}.mlp.c_proj.weight"] = rng.normal(0, 0.05, (width, 4 * width))
        sd[f"{b}.mlp.c_proj.bias"] = rng.normal(0, 0.02, width)
    return sd


def _synthetic_clip_sd(rng, grid=4):
    sd = {
        "visual.conv1.weight": rng.normal(0, 0.05, (VW, 3, P, P)),
        "visual.class_embedding": rng.normal(0, 0.05, VW),
        "visual.positional_embedding": rng.normal(0, 0.05, (1 + grid * grid, VW)),
        "visual.ln_pre.weight": rng.normal(1, 0.02, VW),
        "visual.ln_pre.bias": rng.normal(0, 0.02, VW),
        "visual.ln_post.weight": rng.normal(1, 0.02, VW),
        "visual.ln_post.bias": rng.normal(0, 0.02, VW),
        "visual.proj": rng.normal(0, 0.05, (VW, EMB)),
        "token_embedding.weight": rng.normal(0, 0.02, (VOCAB, TW)),
        "positional_embedding": rng.normal(0, 0.01, (CTX, TW)),
        "ln_final.weight": rng.normal(1, 0.02, TW),
        "ln_final.bias": rng.normal(0, 0.02, TW),
        "text_projection": rng.normal(0, 0.05, (TW, EMB)),
        "logit_scale": np.float32(4.6),
    }
    sd.update(_block_sd(rng, "visual.", VW))
    sd.update(_block_sd(rng, "", TW))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _text_oracle(sd, prompts, eot, heads):
    """Numpy forward of the CLIP text tower from torch-layout weights."""

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-6) * w + b

    B, N, D = prompts.shape
    hd = D // heads
    x = prompts + sd["positional_embedding"][None, :N]
    mask = np.tril(np.ones((N, N), bool))
    for i in range(TL):
        b = f"transformer.resblocks.{i}"
        y = ln(x, sd[f"{b}.ln_1.weight"], sd[f"{b}.ln_1.bias"])
        qkv = y @ sd[f"{b}.attn.in_proj_weight"].T + sd[f"{b}.attn.in_proj_bias"]
        qkv = qkv.reshape(B, N, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = np.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
        att = np.where(mask[None, None], att, -np.inf)
        att = np.exp(att - att.max(-1, keepdims=True))
        att /= att.sum(-1, keepdims=True)
        y = np.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, D)
        x = x + y @ sd[f"{b}.attn.out_proj.weight"].T + sd[f"{b}.attn.out_proj.bias"]
        y = ln(x, sd[f"{b}.ln_2.weight"], sd[f"{b}.ln_2.bias"])
        y = y @ sd[f"{b}.mlp.c_fc.weight"].T + sd[f"{b}.mlp.c_fc.bias"]
        y = y * (1 / (1 + np.exp(-1.702 * y)))
        x = x + y @ sd[f"{b}.mlp.c_proj.weight"].T + sd[f"{b}.mlp.c_proj.bias"]
    x = ln(x, sd["ln_final.weight"], sd["ln_final.bias"])
    return x[np.arange(B), eot] @ sd["text_projection"]


class TestConvertClip:
    def test_all_keys_consumed_and_shapes(self):
        from boxmot_tpu.models.convert import convert_clip

        sd = _synthetic_clip_sd(np.random.default_rng(0))
        out = convert_clip(sd, h_grid=4, w_grid=2)
        assert out["visual"]["params"]["positional_embedding"].shape == (9, VW)
        assert out["text"]["params"]["positional_embedding"].shape == (CTX, TW)
        assert out["token_embedding"].shape == (VOCAB, TW)
        assert out["logit_scale"] == pytest.approx(4.6)
        assert out["prompt_cls_ctx"] is None

    def test_text_tower_matches_numpy_oracle(self):
        from boxmot_tpu.models.clip_reid import ClipTextEncoder
        from boxmot_tpu.models.convert import convert_clip

        rng = np.random.default_rng(1)
        sd = _synthetic_clip_sd(rng)
        out = convert_clip(sd, h_grid=4, w_grid=2)
        enc = ClipTextEncoder(
            width=TW, layers=TL, heads=TH, context=CTX, proj_dim=EMB
        )
        prompts = rng.normal(0, 0.1, (2, 12, TW)).astype(np.float32)
        eot = np.array([11, 11])
        got = np.asarray(enc.apply({"params": out["text"]["params"]}, prompts, eot))
        want = _text_oracle(sd, prompts, eot, TH)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_visual_forward_runs(self):
        from boxmot_tpu.models.clip_reid import ClipReID
        from boxmot_tpu.models.convert import convert_clip

        sd = _synthetic_clip_sd(np.random.default_rng(2))
        out = convert_clip(sd, h_grid=4, w_grid=2)
        model = ClipReID(width=VW, layers=VL, heads=VH, patch_size=P, proj_dim=EMB)
        x = np.zeros((1, 4 * P, 2 * P, 3), np.float32)
        feats = model.apply(out["visual"], x)
        assert feats.shape == (1, VW + EMB)

    def test_pos_embed_resize_preserves_cls_and_interpolates(self):
        from boxmot_tpu.models.convert import _resize_clip_pos_embed

        # linear ramp along rows stays a ramp after bilinear resize
        grid = np.repeat(np.arange(4.0)[:, None], 4, axis=1).reshape(16, 1)
        pos = np.concatenate([np.full((1, 1), 99.0), grid], axis=0)
        got = _resize_clip_pos_embed(pos, 8, 4)
        assert got[0, 0] == 99.0
        rows = got[1:].reshape(8, 4)
        assert np.allclose(rows, rows[:, :1])  # constant along width
        assert (np.diff(rows[:, 0]) >= 0).all()  # monotone ramp
        assert got.shape == (33, 1)

    def test_clipreid_finetune_prefixes(self):
        from boxmot_tpu.models.convert import convert_clip

        rng = np.random.default_rng(3)
        sd = _synthetic_clip_sd(rng)
        ft = {}
        for k, v in sd.items():
            if k.startswith("visual."):
                ft["image_encoder." + k.removeprefix("visual.")] = v
            elif k != "logit_scale":
                ft["text_encoder." + k] = v
            else:
                ft[k] = v
        ft["bottleneck.weight"] = rng.normal(1, 0.02, VW).astype(np.float32)
        ft["bottleneck.bias"] = np.zeros(VW, np.float32)
        ft["bottleneck.running_mean"] = rng.normal(0, 0.1, VW).astype(np.float32)
        ft["bottleneck.running_var"] = np.ones(VW, np.float32)
        ft["prompt_learner.cls_ctx"] = rng.normal(0, 0.02, (5, 4, TW)).astype(
            np.float32
        )
        out = convert_clip(ft, h_grid=4, w_grid=2)
        np.testing.assert_array_equal(
            out["visual"]["params"]["bottleneck"]["scale"], ft["bottleneck.weight"]
        )
        assert out["prompt_cls_ctx"].shape == (5, 4, TW)

    def test_unmapped_keys_raise(self):
        from boxmot_tpu.models.convert import convert_clip

        sd = _synthetic_clip_sd(np.random.default_rng(4))
        sd["mystery.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ValueError, match="unmapped"):
            convert_clip(sd, h_grid=4, w_grid=2)


class TestPretrainedPromptStage:
    def test_stage1_from_converted_weights(self):
        from boxmot_tpu.models.convert import convert_clip
        from boxmot_tpu.reid.training.clip_prompt import (
            PromptStageConfig,
            learn_identity_prompts,
        )

        rng = np.random.default_rng(5)
        sd = _synthetic_clip_sd(rng)
        conv = convert_clip(sd, h_grid=4, w_grid=2)

        n_ids, n_samples = 4, 32
        labels = np.arange(n_samples) % n_ids
        feats = rng.normal(0, 1, (n_samples, EMB)).astype(np.float32)
        feats += conv["token_embedding"][labels % VOCAB, :1]  # id-correlated

        cfg = PromptStageConfig(
            num_classes=n_ids, batch=n_samples, steps=80, lr=1e-2, seed=0
        )
        stage, params, losses = learn_identity_prompts(
            feats, labels, cfg, pretrained=conv
        )
        # text tower stayed frozen at the converted weights
        np.testing.assert_array_equal(
            np.asarray(params["text"]["text_projection"]), sd["text_projection"]
        )
        # template buffers froze at the tokenizer-embedded template
        from boxmot_tpu.models.clip_reid import pretrained_prompt_template

        prefix, suffix, eot = pretrained_prompt_template(
            conv["token_embedding"], n_cls_ctx=4
        )
        np.testing.assert_array_equal(
            np.asarray(params["prompt"]["token_prefix"]), prefix
        )
        np.testing.assert_array_equal(
            np.asarray(params["prompt"]["token_suffix"]), suffix
        )
        assert stage.prompt.eot_index == eot == 11
        # context vectors actually trained: sustained loss drop
        assert losses[-5:].mean() < losses[:5].mean()

    def test_template_embedding_rows(self):
        from boxmot_tpu.models.clip_reid import pretrained_prompt_template
        from boxmot_tpu.models.clip_tokenizer import tokenize

        rng = np.random.default_rng(6)
        tok_emb = rng.normal(0, 1, (49408, 8)).astype(np.float32)
        prefix, suffix, eot = pretrained_prompt_template(tok_emb)
        ids = tokenize("A photo of a X X X X person.")[0]
        np.testing.assert_array_equal(prefix, tok_emb[ids[:5]])
        np.testing.assert_array_equal(suffix, tok_emb[ids[9 : eot + 1]])
        assert eot == 11
