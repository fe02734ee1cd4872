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

Prompt learning / text towers are training-time machinery of CLIP-ReID
and are not needed for feature extraction.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        B, N, D = x.shape
        h = self.heads
        hd = D // h
        y = nn.LayerNorm(name="ln_1")(x)
        qkv = nn.Dense(3 * D, name="qkv")(y).reshape(B, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd)
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
