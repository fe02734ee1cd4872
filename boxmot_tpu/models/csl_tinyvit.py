"""CSL-TinyViT hybrid CNN-Transformer ReID backbones in Flax.

TPU-native re-implementation of the reference CSL-TinyViT family
(boxmot/reid/backbones/csl_tinyvit.py:49-2289): a TinyViT trunk —
stride-4 conv patch embedding, an MBConv stage, then three windowed
self-attention stages with learned relative attention biases and local
depthwise convs — followed by a conv+LayerNorm neck and a
multi-granularity BNNeck head.

Two head flavors ship in the factory:
  * standard MultiBranchHead (head_parts=(1, 2)): global + 2 horizontal
    stripes -> 3 x 512 = 1536-d concat_bn inference feature
  * LMBN-style head (*_lmbn variants): global, drop-global (the spatial
    top-drop is train-only, so at inference it equals global through a
    separate BNNeck), part-global, 2 stripes, 2 channel halves ->
    7 x 512 = 3584-d

Windowed attention pads token grids to window multiples and reuses one
(num_heads, N, N) bias table per block — all static shapes, so every
stage lowers to batched MXU matmuls.  Stochastic depth is a train-time
regularizer the reference schedules per block; this port runs
deterministically.
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBN(nn.Module):
    out: int
    ks: int = 1
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.ks // 2
        x = nn.Conv(
            self.out,
            (self.ks, self.ks),
            strides=self.stride,
            padding=[(p, p)] * 2,
            use_bias=False,
            feature_group_count=self.groups,
            name="c",
        )(x)
        return nn.BatchNorm(use_running_average=not train, name="bn")(x)


class MBConv(nn.Module):
    out: int
    expand: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(x.shape[-1] * self.expand)
        shortcut = x
        x = nn.gelu(ConvBN(hidden, 1, name="conv1")(x, train), approximate=False)
        x = nn.gelu(
            ConvBN(hidden, 3, groups=hidden, name="conv2")(x, train), approximate=False
        )
        x = ConvBN(self.out, 1, name="conv3")(x, train)
        return nn.gelu(x + shortcut, approximate=False)


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):  # NHWC
        x = nn.gelu(ConvBN(self.out_dim, 1, name="conv1")(x, train), approximate=False)
        # no spatial downsample for the wide final stages (csl_tinyvit.py:146-148)
        stride = 1 if self.out_dim in (320, 448, 576) else 2
        x = nn.gelu(
            ConvBN(self.out_dim, 3, stride=stride, groups=self.out_dim, name="conv2")(
                x, train
            ),
            approximate=False,
        )
        return ConvBN(self.out_dim, 1, name="conv3")(x, train)


def _bias_index_table(resolution):
    """Absolute-offset attention bias indices (csl_tinyvit.py:231-246)."""
    points = list(itertools.product(range(resolution[0]), range(resolution[1])))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    N = len(points)
    return np.array(idxs, np.int32).reshape(N, N), len(offsets)


class WindowAttention(nn.Module):
    """Multi-head attention with learned absolute-offset biases
    (csl_tinyvit.py:201-298, attn_ratio=1)."""

    dim: int
    num_heads: int
    resolution: tuple

    @nn.compact
    def __call__(self, x):  # (B, N, dim)
        B, N, _ = x.shape
        h = self.num_heads
        key_dim = self.dim // h
        idx_table, n_offsets = _bias_index_table(self.resolution)
        biases = self.param(
            "attention_biases", nn.initializers.zeros, (h, n_offsets)
        )
        bias = biases[:, idx_table]  # (h, N, N)

        x = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(3 * h * key_dim, name="qkv")(x)
        qkv = qkv.reshape(B, N, h, 3 * key_dim)
        q, k, v = (
            qkv[..., :key_dim],
            qkv[..., key_dim : 2 * key_dim],
            qkv[..., 2 * key_dim :],
        )
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (key_dim**-0.5)
        attn = nn.softmax(attn + bias[None], axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, h * key_dim)
        return nn.Dense(self.dim, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Windowed attention + local depthwise conv + pre-norm MLP
    (csl_tinyvit.py:392-552; default no shift, no mask)."""

    dim: int
    num_heads: int
    window: tuple
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, C)
        B, H, W, C = x.shape
        wh, ww = self.window
        res = x

        if H == wh and W == ww:
            y = WindowAttention(self.dim, self.num_heads, (wh, ww), name="attn")(
                x.reshape(B, H * W, C)
            ).reshape(B, H, W, C)
        else:
            pad_b = (wh - H % wh) % wh
            pad_r = (ww - W % ww) % ww
            y = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            pH, pW = H + pad_b, W + pad_r
            nH, nW = pH // wh, pW // ww
            y = y.reshape(B, nH, wh, nW, ww, C).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(B * nH * nW, wh * ww, C)
            y = WindowAttention(self.dim, self.num_heads, (wh, ww), name="attn")(y)
            y = y.reshape(B, nH, nW, wh, ww, C).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(B, pH, pW, C)[:, :H, :W]
        x = res + y

        x = ConvBN(self.dim, 3, groups=self.dim, name="local_conv")(x, train)

        y = nn.LayerNorm(name="mlp_norm")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC features (csl_tinyvit.py:608-624)."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        x = (x - mu) / jnp.sqrt(var + 1e-6)
        w = self.param("weight", nn.initializers.ones, (C,))
        b = self.param("bias", nn.initializers.zeros, (C,))
        return x * w + b


class BNNeck3(nn.Module):
    """1x1 reduction + BatchNorm (bias-frozen) — csl_tinyvit BNNeck3."""

    feat_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, D)
        x = nn.Dense(self.feat_dim, use_bias=False, name="reduction")(x)
        return nn.BatchNorm(use_running_average=not train, use_bias=False, name="bn")(x)


class CSLTinyViT(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand: float = 4.0
    feat_dim: int = 512
    neck_dim: int = 512
    lmbn_head: bool = False

    @property
    def feature_dim(self) -> int:
        return (7 if self.lmbn_head else 3) * self.feat_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = self.embed_dims
        # patch embed: two stride-2 conv-bn with GELU between (:84-102)
        x = nn.gelu(
            ConvBN(dims[0] // 2, 3, 2, name="pe_conv1")(x, train), approximate=False
        )
        x = ConvBN(dims[0], 3, 2, name="pe_conv2")(x, train)

        # stage 0: MBConv blocks + merge
        for b in range(self.depths[0]):
            x = MBConv(dims[0], self.mbconv_expand, name=f"s0_b{b}")(x, train)
        x = PatchMerging(dims[1], name="merge0")(x, train)

        # stages 1..3: windowed attention
        for s in range(1, len(self.depths)):
            win = self.window_sizes[s]
            win = (win, win) if isinstance(win, int) else tuple(win)
            for b in range(self.depths[s]):
                x = TinyViTBlock(
                    dims[s], self.num_heads[s], win, self.mlp_ratio,
                    name=f"s{s}_b{b}",
                )(x, train)
            if s < len(self.depths) - 1:
                x = PatchMerging(dims[s + 1], name=f"merge{s}")(x, train)

        # neck: 1x1 conv + LN2d + 3x3 conv + LN2d (:1772-1778)
        x = nn.Conv(self.neck_dim, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(
            self.neck_dim, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
            name="neck_conv2",
        )(x)
        x = LayerNorm2d(name="neck_ln2")(x)

        # heads
        H = x.shape[1]
        gavg = lambda t: jnp.mean(t, axis=(1, 2))
        g = gavg(x)
        p0 = gavg(x[:, : H // 2])
        p1 = gavg(x[:, H // 2 :])

        f_global = BNNeck3(self.feat_dim, name="bn_global")(g, train)
        f_p0 = BNNeck3(self.feat_dim, name="bn_part0")(p0, train)
        f_p1 = BNNeck3(self.feat_dim, name="bn_part1")(p1, train)

        if not self.lmbn_head:
            feats = [f_global, f_p0, f_p1]
        else:
            # LMBN-style extras (:1224-1305); the spatial top-drop is
            # train-only, so drop_global sees the undropped map at eval.
            f_drop = BNNeck3(self.feat_dim, name="bn_drop_global")(g, train)
            f_pg = BNNeck3(self.feat_dim, name="bn_part_global")(g, train)
            half = self.neck_dim // 2
            shared_fc = nn.Dense(self.feat_dim, use_bias=False, name="channel_shared")
            shared_bn = nn.BatchNorm(
                use_running_average=not train, name="channel_shared_bn"
            )
            c0 = nn.relu(shared_bn(shared_fc(g[:, :half])))
            c1 = nn.relu(shared_bn(shared_fc(g[:, half:])))
            f_c0 = BNNeck3(self.feat_dim, name="bn_ch0")(c0, train)
            f_c1 = BNNeck3(self.feat_dim, name="bn_ch1")(c1, train)
            feats = [f_global, f_drop, f_pg, f_p0, f_p1, f_c0, f_c1]

        # concat_bn: stack(dim=2).flatten -> channel-major interleave
        return jnp.stack(feats, axis=2).reshape(x.shape[0], -1)


_CSL_VARIANTS = {
    "csl_tinyvit_7m": dict(embed_dims=(64, 128, 160, 320), num_heads=(2, 4, 5, 10)),
    "csl_tinyvit_11m": dict(embed_dims=(64, 128, 256, 448), num_heads=(2, 4, 8, 14)),
    "csl_tinyvit_23m": dict(embed_dims=(96, 192, 384, 576), num_heads=(3, 6, 12, 18)),
}
_CSL_ALIASES = {
    "csl_tinyvit_small": "csl_tinyvit_7m",
    "csl_tinyvit_normal": "csl_tinyvit_11m",
    "csl_tinyvit_large": "csl_tinyvit_23m",
    "csl_tinyvit_lmbn": "csl_tinyvit_11m_lmbn",
}


def build_csl_tinyvit(name: str) -> CSLTinyViT:
    """Factory for the 10 reference variants (csl_tinyvit.py:2070-2268)."""
    name = _CSL_ALIASES.get(name, name)
    lmbn = name.endswith("_lmbn")
    base = name[: -len("_lmbn")] if lmbn else name
    if base not in _CSL_VARIANTS:
        raise ValueError(f"unknown CSL-TinyViT variant {name!r}")
    return CSLTinyViT(lmbn_head=lmbn, **_CSL_VARIANTS[base])
