"""CLIP-ReID backbone in Flax.

TPU-native re-implementation of the reference CLIP-ReID image path
(boxmot/reid/backbones/clip/make_model.py:35-152 and
clip/model.py:186-295): the CLIP ViT-B/16 visual encoder — conv patch
embedding, class token, positional embedding, pre-LN transformer with
QuickGELU MLPs — run at ReID resolution (stride-16 patches over
256 x 128 by default).  The encoder returns the layer-12 CLS token
(768-d, post ln_post) and its 512-d CLIP projection; inference
concatenates the two BNNeck-normalized features into a 1280-d
embedding (build_transformer.forward, make_model.py:92-141,
TEST.NECK_FEAT == "after").

The prompt-learning machinery (text tower + per-identity context
tokens, boxmot/reid/backbones/clip/make_model_clipreid.py:37-278) is
train-only in the reference and lives here as `ClipTextEncoder` /
`PromptLearner` / `clip_prompt_losses`; feature extraction never needs
it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    dim: int
    heads: int
    causal: bool = False  # text tower attends left-to-right

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        B, N, D = x.shape
        h = self.heads
        hd = D // h
        y = nn.LayerNorm(name="ln_1")(x)
        qkv = nn.Dense(3 * D, name="qkv")(y).reshape(B, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd)
        if self.causal:
            mask = jnp.tril(jnp.ones((N, N), bool))
            attn = jnp.where(mask[None, None], attn, -jnp.inf)
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        x = x + nn.Dense(D, name="out_proj")(y)
        y = nn.LayerNorm(name="ln_2")(x)
        y = nn.Dense(4 * D, name="c_fc")(y)
        y = quick_gelu(y)
        return x + nn.Dense(D, name="c_proj")(y)


class ClipReID(nn.Module):
    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16
    proj_dim: int = 512

    @property
    def feature_dim(self) -> int:
        return self.width + self.proj_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        D = self.width
        x = nn.Conv(
            D,
            (self.patch_size, self.patch_size),
            strides=self.patch_size,
            padding="VALID",
            use_bias=False,
            name="conv1",
        )(x)
        x = x.reshape(B, -1, D)
        N = x.shape[1]
        scale = D**-0.5
        cls = self.param(
            "class_embedding", nn.initializers.normal(scale), (D,)
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(scale), (N + 1, D)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), x], axis=1)
        x = x + pos[None]
        x = nn.LayerNorm(name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(D, self.heads, name=f"resblock{i}")(x)
        x = nn.LayerNorm(name="ln_post")(x)

        proj = self.param("proj", nn.initializers.normal(scale), (D, self.proj_dim))
        feat = x[:, 0]  # (B, 768) CLS
        feat_proj = feat @ proj  # (B, 512)

        bn = nn.BatchNorm(
            use_running_average=not train, use_bias=False, name="bottleneck"
        )(feat)
        bn_proj = nn.BatchNorm(
            use_running_average=not train, use_bias=False, name="bottleneck_proj"
        )(feat_proj)
        return jnp.concatenate([bn, bn_proj], axis=-1)


def build_clip_reid() -> ClipReID:
    return ClipReID()


# ---------------------------------------------------------------------------
# Prompt learning (CLIP-ReID stage 1) — train-only machinery
# ---------------------------------------------------------------------------
#
# The reference builds per-identity text prompts "A photo of a X X X X
# person." where the four X slots are learned 512-d context vectors per
# identity (make_model_clipreid.py:232-278 PromptLearner), encodes them
# with the frozen CLIP text transformer (TextEncoder, :37-57), and
# optimizes the context vectors with a symmetric image<->text supervised
# contrastive objective.  This port drops the BPE tokenizer: prompts are
# built directly in embedding space from a fixed template of learned
# token embeddings, which is equivalent for training from scratch (the
# tokenizer only matters for importing OpenAI's pretrained text weights).


class ClipTextEncoder(nn.Module):
    """CLIP text transformer over pre-embedded prompts.

    Mirrors TextEncoder (make_model_clipreid.py:37-57): positional
    embedding + causal transformer + final LN, projecting the
    end-of-text position to the shared image/text space.
    """

    width: int = 512
    layers: int = 12
    heads: int = 8
    context: int = 16  # template is short; CLIP's 77 is configurable
    proj_dim: int = 512

    @nn.compact
    def __call__(self, prompts, eot_idx):
        # prompts: (B, N, width) embedded tokens; eot_idx: scalar or (B,)
        N = prompts.shape[1]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context, self.width),
        )
        x = prompts + pos[None, :N]
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, causal=True, name=f"resblock{i}"
            )(x)
        x = nn.LayerNorm(name="ln_final")(x)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.proj_dim),
        )
        eot = jnp.broadcast_to(jnp.asarray(eot_idx), (x.shape[0],))
        return jnp.take_along_axis(
            x, eot[:, None, None].astype(jnp.int32), axis=1
        )[:, 0] @ proj


class PromptLearner(nn.Module):
    """Per-identity learned context inside a fixed prompt template.

    The template contributes `n_prefix` leading and `n_suffix` trailing
    token embeddings (learned once, shared by all identities — standing
    in for the frozen embeddings of "A photo of a" / "person." +EOT);
    each identity owns `n_cls_ctx` context vectors spliced in between
    (make_model_clipreid.py:232-278).
    """

    num_classes: int
    width: int = 512
    n_prefix: int = 5  # SOT + "A photo of a"
    n_cls_ctx: int = 4
    n_suffix: int = 2  # "person." + EOT

    @property
    def seq_len(self) -> int:
        return self.n_prefix + self.n_cls_ctx + self.n_suffix

    @property
    def eot_index(self) -> int:
        return self.seq_len - 1

    @nn.compact
    def __call__(self, labels):  # (B,) int32 identity labels
        prefix = self.param(
            "token_prefix", nn.initializers.normal(0.02), (self.n_prefix, self.width)
        )
        suffix = self.param(
            "token_suffix", nn.initializers.normal(0.02), (self.n_suffix, self.width)
        )
        cls_ctx = self.param(
            "cls_ctx",
            nn.initializers.normal(0.02),
            (self.num_classes, self.n_cls_ctx, self.width),
        )
        B = labels.shape[0]
        return jnp.concatenate(
            [
                jnp.broadcast_to(prefix[None], (B, self.n_prefix, self.width)),
                cls_ctx[labels],
                jnp.broadcast_to(suffix[None], (B, self.n_suffix, self.width)),
            ],
            axis=1,
        )


def pretrained_prompt_template(
    token_embedding,
    template: str = "A photo of a X X X X person.",
    n_cls_ctx: int = 4,
):
    """Embed the CLIP-ReID prompt template with pretrained token embeddings.

    Tokenizes the template with the real BPE tokenizer and splits the
    embedded sequence around the per-identity context slots exactly like
    the reference PromptLearner (make_model_clipreid.py:244-261:
    token_prefix = embedding[:n_ctx+1], token_suffix =
    embedding[n_ctx+1+n_cls_ctx:]).  Padding rows past EOT are dropped —
    under causal attention they never influence the EOT output the text
    encoder projects.

    Returns (prefix (n_prefix, width), suffix (n_suffix, width),
    eot_index) as numpy arrays for initializing PromptLearner params.
    """
    import numpy as np

    from boxmot_tpu.models.clip_tokenizer import tokenize

    ids = tokenize(template)[0]
    eot = int(ids.argmax())  # EOT has the largest id in the vocab
    emb = np.asarray(token_embedding, np.float32)[ids[: eot + 1]]
    n_prefix = 1 + 4  # SOT + "a photo of a"
    return (
        emb[:n_prefix],
        emb[n_prefix + n_cls_ctx :],
        eot,
    )


def clip_prompt_losses(image_feats, text_feats, labels, temperature: float = 0.07):
    """Symmetric supervised contrastive i2t + t2i objective (CLIP-ReID
    stage 1, SupConLoss over both directions).  Rows of `text_feats`
    are the encoded prompts of `labels`; positives are all pairs that
    share an identity."""
    img = image_feats / jnp.clip(
        jnp.linalg.norm(image_feats, axis=1, keepdims=True), 1e-12
    )
    txt = text_feats / jnp.clip(
        jnp.linalg.norm(text_feats, axis=1, keepdims=True), 1e-12
    )
    logits = img @ txt.T / temperature  # (B, B)
    same = labels[:, None] == labels[None, :]

    def supcon(lg, pos):
        logp = jax.nn.log_softmax(lg, axis=1)
        n_pos = jnp.maximum(jnp.sum(pos, axis=1), 1)
        return -jnp.mean(jnp.sum(jnp.where(pos, logp, 0.0), axis=1) / n_pos)

    return supcon(logits, same) + supcon(logits.T, same)
