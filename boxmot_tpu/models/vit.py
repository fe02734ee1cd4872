"""ViT-Nano / ViT-Tiny ReID backbones in Flax.

TPU-native re-implementation of the reference's lightweight ReID
transformers (boxmot/reid/backbones/vit_nano.py:51-580 and
vit_tiny.py:27-201):

  * PatchEmbed: non-overlapping (or TransReID-style overlapping) conv
    patches + CLS token + learned positional embedding
  * Block: pre-norm attention/MLP; the first half of blocks can use
    AdaptiveINLN — a learned per-channel blend of InstanceNorm (style
    removal) and LayerNorm (content) (vit_nano.py:135-164)
  * OmniScaleAggregation: horizontal strip pooling at 1/2/4/8 strips
    fused by a single shared channel gate (vit_nano.py:187-267)
  * BNNeck head: the inference feature is the batch-normed embedding
    (Bag-of-Tricks); classifier heads live in the trainer
  * ViTTinyParts: additional horizontal part heads whose BN features
    concatenate with the global feature at inference (vit_tiny.py:27-144)

Transformers are the most MXU-friendly shape in the zoo: every layer is
a large batched matmul.  Stochastic depth (drop_path) is a train-time
regularizer the reference applies per block; this port runs
deterministically (inference parity is exact; training omits it).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int = 16
    stride: int | None = None

    @nn.compact
    def __call__(self, x):
        s = self.stride or self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=s,
            padding="VALID",
            name="proj",
        )(x)
        B, H, W, D = x.shape
        return x.reshape(B, H * W, D), (H, W)


class AdaptiveINLN(nn.Module):
    """gate * IN(x) + (1 - gate) * LN(x), gate = sigmoid(learned per-dim)."""

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        D = x.shape[-1]
        ln = nn.LayerNorm(name="ln")(x)
        # InstanceNorm1d over the token axis, per channel, affine
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        inx = (x - mu) / jnp.sqrt(var + 1e-5)
        in_scale = self.param("in_scale", nn.initializers.ones, (D,))
        in_bias = self.param("in_bias", nn.initializers.zeros, (D,))
        inx = inx * in_scale + in_bias
        gate = nn.sigmoid(self.param("gate", nn.initializers.zeros, (D,)))
        return gate * inx + (1.0 - gate) * ln


class Attention(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = self.num_heads
        hd = D // h
        qkv = nn.Dense(3 * D, name="qkv")(x).reshape(B, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, name="proj")(out)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    use_ain: bool = False

    @nn.compact
    def __call__(self, x):
        norm1 = AdaptiveINLN(name="norm1") if self.use_ain else nn.LayerNorm(name="norm1")
        x = x + Attention(self.num_heads, name="attn")(norm1(x))
        y = nn.LayerNorm(name="norm2")(x)
        D = x.shape[-1]
        y = nn.Dense(int(D * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(D, name="fc2")(y)
        return x + y


def _strip_pool(spatial, n_strips):
    """Average-pool (B, H, W, D) into n_strips horizontal strips then
    average strips -> (B, D).  Uneven H splits follow torch adaptive
    pooling boundaries floor(i*H/S)..ceil((i+1)*H/S)."""
    B, H, W, D = spatial.shape
    strips = []
    for i in range(n_strips):
        lo = (i * H) // n_strips
        hi = -(-((i + 1) * H) // n_strips)  # ceil
        strips.append(jnp.mean(spatial[:, lo:hi], axis=(1, 2)))
    return jnp.mean(jnp.stack(strips, axis=1), axis=1)


class OmniScaleAggregation(nn.Module):
    """Strip pooling at 1/2/4/8 strips, per-scale LayerNorm, fused by a
    single shared channel gate (vit_nano.py:212-267)."""

    reduction: int = 16
    num_scales: int = 4

    @nn.compact
    def __call__(self, spatial):  # (B, H, W, D)
        D = spatial.shape[-1]
        mid = max(D // self.reduction, 1)
        gate_fc1 = nn.Dense(mid, name="gate_fc1")
        gate_fc2 = nn.Dense(D, name="gate_fc2")
        fused = 0.0
        for i in range(self.num_scales):
            pooled = _strip_pool(spatial, 2**i)
            pooled = nn.LayerNorm(name=f"scale_norm{i}")(pooled)
            g = nn.sigmoid(gate_fc2(nn.relu(gate_fc1(pooled))))
            fused = fused + g * pooled
        return fused


class ViTNano(nn.Module):
    """Lightweight ReID ViT; returns the BNNeck inference feature."""

    img_size: Sequence[int] = (256, 128)
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 6
    num_heads: int = 3
    mlp_ratio: float = 4.0
    ain: bool = False
    omni_scale: bool = False
    pool: str = "cls"
    patch_stride: int | None = None
    feat_dim: int | None = None

    @property
    def feature_dim(self) -> int:
        return self.feat_dim or self.embed_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat, _ = self._features(x, train)
        return feat

    def _features(self, x, train):
        B = x.shape[0]
        tokens, (gh, gw) = PatchEmbed(
            self.embed_dim, self.patch_size, self.patch_stride, name="patch_embed"
        )(x)
        N = tokens.shape[1]
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, N + 1, self.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.embed_dim)), tokens], 1)
        x = x + pos
        ain_depth = self.depth // 2 if self.ain else 0
        for i in range(self.depth):
            x = Block(
                self.num_heads,
                self.mlp_ratio,
                use_ain=i < ain_depth,
                name=f"block{i}",
            )(x)
        x = nn.LayerNorm(name="norm")(x)

        patch_tokens = x[:, 1:]
        if self.omni_scale:
            spatial = patch_tokens.reshape(B, gh, gw, self.embed_dim)
            v = OmniScaleAggregation(name="os_agg")(spatial)
        elif self.pool == "gap":
            v = jnp.mean(patch_tokens, axis=1)
        else:
            v = x[:, 0]
        if self.feat_dim and self.feat_dim != self.embed_dim:
            v = nn.Dense(self.feat_dim, use_bias=False, name="proj")(v)
        feat = nn.BatchNorm(
            use_running_average=not train, use_bias=False, name="bottleneck"
        )(v)
        return feat, (x, gh, gw)


class ViTTinyParts(ViTNano):
    """ViT with horizontal part heads; inference feature is
    [global BNNeck, part BNNecks] concatenated (vit_tiny.py:107-131)."""

    num_parts: int = 2

    @property
    def feature_dim(self) -> int:
        return (1 + self.num_parts) * (self.feat_dim or self.embed_dim)

    @property
    def part_dims(self) -> tuple:
        """Segment widths of the concatenated feature: global first,
        then each part stripe.  Consumed by the trainer's multi-logit
        part heads (reference's list-of-logits contract,
        boxmot/reid/training/trainer.py:1788-1797)."""
        fd = self.feat_dim or self.embed_dim
        return (fd,) * (1 + self.num_parts)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat, (tokens, gh, gw) = self._features(x, train)
        B = tokens.shape[0]
        spatial = tokens[:, 1:].reshape(B, gh, gw, self.embed_dim)
        fd = self.feat_dim or self.embed_dim
        outs = [feat]
        strip_h = gh // self.num_parts
        for i in range(self.num_parts):
            lo = i * strip_h
            hi = lo + strip_h if i < self.num_parts - 1 else gh
            p = jnp.mean(spatial[:, lo:hi], axis=(1, 2))
            if fd != self.embed_dim:
                p = nn.Dense(fd, use_bias=False, name=f"part_proj{i}")(p)
            p = nn.BatchNorm(
                use_running_average=not train, use_bias=False, name=f"part_bn{i}"
            )(p)
            outs.append(p)
        return jnp.concatenate(outs, axis=-1)


def build_vit(name: str):
    """Factory entries matching the reference builders
    (vit_nano.py:525-580, vit_tiny.py:146-201)."""
    if name == "vit_nano":
        return ViTNano()
    if name == "vit_nano_ain":
        return ViTNano(ain=True)
    if name == "vit_nano_ain_os":
        return ViTNano(ain=True, omni_scale=True)
    if name == "vit_tiny":
        return ViTNano(
            img_size=(384, 128), depth=12, patch_stride=12, feat_dim=512
        )
    if name == "vit_tiny_parts":
        return ViTTinyParts(
            img_size=(384, 128), depth=12, patch_stride=12, feat_dim=512, num_parts=2
        )
    if name == "vit_tiny_parts3":
        return ViTTinyParts(
            img_size=(384, 128), depth=12, patch_stride=12, feat_dim=512, num_parts=3
        )
    raise ValueError(f"unknown ViT variant {name!r}")
