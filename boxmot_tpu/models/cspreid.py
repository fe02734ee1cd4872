"""CSPReID-n ReID backbone in Flax.

TPU-native re-implementation of the reference CSPReID Nano
(boxmot/reid/backbones/cspreid_n.py:34-340): YOLO-style C3k2
cross-stage-partial blocks + SPPF + a light channel/spatial attention,
finished by an LMBN-inspired multi-branch head (global + two horizontal
halves, each through a BNNeck); the inference embedding is the three
512-d BN'd features stacked channel-major to 1536-d.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from boxmot_tpu.models.lmbn import BNNeck3


class ConvBNSiLU(nn.Module):
    out: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.out,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=[(p, p)] * 2,
            use_bias=False,
            feature_group_count=self.groups,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out * self.expansion)
        y = ConvBNSiLU(mid, 1, name="cv1")(x, train)
        y = ConvBNSiLU(self.out, 3, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.out else y


class C3k2(nn.Module):
    """CSP bottleneck: split, chain n bottlenecks, concat, fuse."""

    out: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out * self.expansion)
        y = ConvBNSiLU(2 * mid, 1, name="cv1")(x, train)
        parts = [y[..., :mid], y[..., mid:]]
        cur = parts[-1]
        for i in range(self.n):
            cur = Bottleneck(mid, self.shortcut, name=f"b{i}")(cur, train)
            parts.append(cur)
        return ConvBNSiLU(self.out, 1, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SPPF(nn.Module):
    out: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        x = ConvBNSiLU(mid, 1, name="cv1")(x, train)
        p = self.k // 2
        pool = lambda t: nn.max_pool(
            t, (self.k, self.k), strides=(1, 1), padding=[(p, p)] * 2
        )
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBNSiLU(self.out, 1, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class LightSelfAttention(nn.Module):
    reduction: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        mid = max(C // self.reduction, 16)
        ca = jnp.mean(x, axis=(1, 2), keepdims=True)
        ca = nn.silu(nn.Conv(mid, (1, 1), use_bias=False, name="fc1")(ca))
        ca = nn.sigmoid(nn.Conv(C, (1, 1), use_bias=False, name="fc2")(ca))
        x = x * ca
        sa = nn.Conv(
            C, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
            feature_group_count=C, name="sp_dw",
        )(x)
        sa = nn.silu(nn.BatchNorm(use_running_average=not train, name="sp_bn")(sa))
        sa = nn.sigmoid(nn.Conv(1, (1, 1), use_bias=False, name="sp_pw")(sa))
        return x * sa


class CSPReID(nn.Module):
    feat_dim: int = 512

    @property
    def feature_dim(self) -> int:
        return 3 * self.feat_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNSiLU(32, 3, 2, name="stem0")(x, train)
        x = ConvBNSiLU(64, 3, 2, name="stem1")(x, train)
        x = C3k2(128, 1, name="s1_c3k2")(x, train)
        x = ConvBNSiLU(128, 3, 2, name="s1_down")(x, train)
        x = C3k2(256, 1, name="s2_c3k2")(x, train)
        x = ConvBNSiLU(256, 3, 2, name="s2_down")(x, train)
        x = C3k2(384, 2, name="s3_c3k2")(x, train)
        x = ConvBNSiLU(384, 3, 2, name="s3_down")(x, train)
        x = C3k2(512, 1, name="s4_c3k2")(x, train)
        x = SPPF(512, k=3, name="sppf")(x, train)
        x = LightSelfAttention(name="attn")(x, train)

        # multi-branch head: global + horizontal halves (cspreid_n.py:169-222)
        H = x.shape[1]
        g = jnp.mean(x, axis=(1, 2))
        p0 = jnp.mean(x[:, : H // 2], axis=(1, 2))
        p1 = jnp.mean(x[:, H // 2 :], axis=(1, 2))
        f_glo = BNNeck3(self.feat_dim, name="bn_global")(g, train)
        f_p0 = BNNeck3(self.feat_dim, name="bn_part0")(p0, train)
        f_p1 = BNNeck3(self.feat_dim, name="bn_part1")(p1, train)
        return jnp.stack([f_glo, f_p0, f_p1], axis=2).reshape(x.shape[0], -1)


def build_cspreid() -> CSPReID:
    return CSPReID()
