"""CLIP-ReID prompt learning (stage 1): text tower, prompt learner,
contrastive objective (reference make_model_clipreid.py:37-278)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxmot_tpu.models.clip_reid import (
    ClipTextEncoder,
    PromptLearner,
    clip_prompt_losses,
)
from boxmot_tpu.reid.training.clip_prompt import (
    PromptStage,
    PromptStageConfig,
    learn_identity_prompts,
)

TINY = dict(feat_dim=32, width=32, text_layers=2, text_heads=2)


def _tiny_cfg(num_classes=4, **over):
    base = dict(num_classes=num_classes, batch=16, steps=40, lr=3e-3, seed=0)
    base.update(TINY)
    base.update(over)
    return PromptStageConfig(**base)


class TestModules:
    def test_prompt_shapes_and_identity_rows(self):
        pl = PromptLearner(num_classes=5, width=16)
        vars_ = pl.init(jax.random.PRNGKey(0), jnp.zeros((3,), jnp.int32))
        labels = jnp.asarray([1, 1, 4], jnp.int32)
        prompts = pl.apply(vars_, labels)
        assert prompts.shape == (3, pl.seq_len, 16)
        # same identity -> identical prompt rows; different -> distinct ctx
        assert np.allclose(prompts[0], prompts[1])
        ctx = slice(pl.n_prefix, pl.n_prefix + pl.n_cls_ctx)
        assert not np.allclose(prompts[0, ctx], prompts[2, ctx])
        # template prefix/suffix shared across identities
        assert np.allclose(prompts[0, : pl.n_prefix], prompts[2, : pl.n_prefix])

    def test_text_encoder_causal_and_projected(self):
        enc = ClipTextEncoder(width=16, layers=2, heads=2, context=8, proj_dim=12)
        prompts = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
        vars_ = enc.init(jax.random.PRNGKey(0), prompts, 7)
        out = enc.apply(vars_, prompts, 7)
        assert out.shape == (2, 12)
        # causality: perturbing a token after the EOT readout position
        # changes nothing when reading an earlier position
        out_early = enc.apply(vars_, prompts, 3)
        perturbed = prompts.at[:, 6].add(1.0)
        out_early2 = enc.apply(vars_, perturbed, 3)
        assert np.allclose(out_early, out_early2, atol=1e-6)

    def test_loss_prefers_aligned_pairs(self):
        labels = jnp.asarray([0, 0, 1, 1], jnp.int32)
        eye = jnp.eye(4, dtype=jnp.float32)
        img = eye[jnp.asarray([0, 0, 1, 1])]  # identity-aligned features
        good = clip_prompt_losses(img, img, labels)
        bad = clip_prompt_losses(img, img[::-1], labels)
        assert float(good) < float(bad)


class TestStage1:
    def _features(self, n_per=8, num_classes=4, dim=32, sep=4.0, seed=0):
        rng = np.random.default_rng(seed)
        centers = rng.normal(0, sep, (num_classes, dim))
        feats, labels = [], []
        for c in range(num_classes):
            feats.append(centers[c] + rng.normal(0, 0.3, (n_per, dim)))
            labels.extend([c] * n_per)
        return np.concatenate(feats).astype(np.float32), np.asarray(labels)

    def test_prompt_learning_converges(self):
        feats, labels = self._features()
        stage, params, losses = learn_identity_prompts(
            feats, labels, _tiny_cfg(), train_text=True
        )
        assert np.isfinite(losses).all()
        assert losses[-5:].mean() < losses[:5].mean() * 0.9

        # learned prompts separate identities: each image feature is
        # closest to its own identity's text feature
        txt = np.array(stage.encode(params, jnp.arange(4, dtype=jnp.int32)))
        txt /= np.linalg.norm(txt, axis=1, keepdims=True)
        img = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        pred = (img @ txt.T).argmax(axis=1)
        assert (pred == labels).mean() >= 0.9

    def test_frozen_text_trains_only_prompts(self):
        feats, labels = self._features(n_per=4)
        cfg = _tiny_cfg(steps=5)
        stage = PromptStage(cfg)
        init = stage.init(jax.random.PRNGKey(cfg.seed))
        _, params, _ = learn_identity_prompts(feats, labels, cfg, train_text=False)
        same_text = jax.tree_util.tree_all(
            jax.tree.map(
                lambda a, b: bool(np.allclose(a, b)), init["text"], params["text"]
            )
        )
        moved_prompt = not np.allclose(
            init["prompt"]["cls_ctx"], params["prompt"]["cls_ctx"]
        )
        assert same_text and moved_prompt
