"""HACNN (Harmonious Attention CNN) ReID backbone in Flax.

TPU-native re-implementation of the reference HACNN
(boxmot/reid/backbones/hacnn.py:12-406; Li et al., CVPR 2018):
Inception-A/B blocks with harmonious attention — soft attention
(spatial x channel, sigmoid-gated) on the global branch, and hard
attention (a learned 4-region spatial transformer) feeding a local
branch whose region features accumulate across the three blocks.
Inference returns the L2-normalized [global, local] concatenation
(2 x feat_dim = 1024-d).  Input is fixed at 160 x 64 like the
reference.  The STN grid sample and align-corners resizes are gather
pipelines that fuse into the surrounding convs under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

# per-region scale factors: full width, quarter height (hacnn.py:268-274)
_REGION_SCALE = (1.0, 0.25)
# initial region centers (ty): vertical strips (hacnn.py:162-166)
_REGION_INIT_TY = (-0.75, -0.25, 0.25, 0.75)


def _grid_sample(x, theta, out_hw):
    """Affine grid sample (torch affine_grid + grid_sample semantics,
    align_corners=False, zero padding).  x: (B, H, W, C); theta: (B, 2, 3)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    ys = (jnp.arange(oh) + 0.5) / oh * 2.0 - 1.0
    xs = (jnp.arange(ow) + 0.5) / ow * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (oh, ow)
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # (N, 3)
    src = jnp.einsum("bij,nj->bni", theta, coords)  # (B, N, 2) normalized x, y
    px = ((src[..., 0] + 1.0) * W - 1.0) / 2.0
    py = ((src[..., 1] + 1.0) * H - 1.0) / 2.0

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(
            x.reshape(B, H * W, C),
            (yc * W + xc)[..., None].astype(jnp.int32),
            axis=1,
        )
        return jnp.where(inside[..., None], vals, 0.0)

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out.reshape(B, oh, ow, C)


def _resize_ac(x, out_hw):
    """Bilinear resize with align_corners=True (F.interpolate semantics)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    ys = jnp.arange(oh) * ((H - 1) / max(oh - 1, 1))
    xs = jnp.arange(ow) * ((W - 1) / max(ow - 1, 1))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx


class ConvBlock(nn.Module):
    out: int
    k: int = 1
    s: int = 1
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out, (self.k, self.k), strides=self.s,
            padding=[(self.p, self.p)] * 2, name="conv",
        )(x)
        return nn.relu(nn.BatchNorm(use_running_average=not train, name="bn")(x))


class InceptionA(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out // 4
        s1 = ConvBlock(mid, 3, p=1, name="s1b")(ConvBlock(mid, 1, name="s1a")(x, train), train)
        s2 = ConvBlock(mid, 3, p=1, name="s2b")(ConvBlock(mid, 1, name="s2a")(x, train), train)
        s3 = ConvBlock(mid, 3, p=1, name="s3b")(ConvBlock(mid, 1, name="s3a")(x, train), train)
        s4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
        s4 = ConvBlock(mid, 1, name="s4")(s4, train)
        return jnp.concatenate([s1, s2, s3, s4], axis=-1)


class InceptionB(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out // 4
        s1 = ConvBlock(mid, 3, s=2, p=1, name="s1b")(ConvBlock(mid, 1, name="s1a")(x, train), train)
        s2 = ConvBlock(mid, 3, p=1, name="s2b")(ConvBlock(mid, 1, name="s2a")(x, train), train)
        s2 = ConvBlock(mid, 3, s=2, p=1, name="s2c")(s2, train)
        s3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        s3 = ConvBlock(mid * 2, 1, name="s3")(s3, train)
        return jnp.concatenate([s1, s2, s3], axis=-1)


class SoftAttn(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # spatial: mean over channels, conv/2, upsample x2 (align corners), conv
        sp = jnp.mean(x, axis=-1, keepdims=True)
        sp = ConvBlock(1, 3, s=2, p=1, name="sp1")(sp, train)
        sp = _resize_ac(sp, (sp.shape[1] * 2, sp.shape[2] * 2))
        sp = ConvBlock(1, 1, name="sp2")(sp, train)
        # channel: squeeze-excite with conv blocks
        ch = jnp.mean(x, axis=(1, 2), keepdims=True)
        ch = ConvBlock(self.channels // 16, 1, name="ch1")(ch, train)
        ch = ConvBlock(self.channels, 1, name="ch2")(ch, train)
        y = sp * ch
        return nn.sigmoid(ConvBlock(self.channels, 1, name="fuse")(y, train))


class HardAttn(nn.Module):
    """Predicts 4 region centers (tx, ty); bias init at the vertical
    strip layout (hacnn.py:154-175)."""

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2))
        init_bias = jnp.array(
            [v for ty in _REGION_INIT_TY for v in (0.0, ty)], jnp.float32
        )
        theta = nn.Dense(
            8,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: init_bias,
            name="fc",
        )(g)
        return jnp.tanh(theta).reshape(-1, 4, 2)


class HACNN(nn.Module):
    nchannels: tuple = (128, 256, 384)
    feat_dim_single: int = 512
    learn_region: bool = True

    @property
    def feature_dim(self) -> int:
        return self.feat_dim_single * (2 if self.learn_region else 1)

    def _theta(self, centers):
        """(B, 4, 2) tanh centers -> four (B, 2, 3) affines with the fixed
        full-width / quarter-height scale (transform_theta)."""
        B = centers.shape[0]
        sw, sh = _REGION_SCALE
        base = jnp.array([[sw, 0.0, 0.0], [0.0, sh, 0.0]], jnp.float32)
        thetas = []
        for r in range(4):
            t = jnp.broadcast_to(base, (B, 2, 3))
            t = t.at[:, 0, 2].set(centers[:, r, 0])
            t = t.at[:, 1, 2].set(centers[:, r, 1])
            thetas.append(t)
        return thetas

    @nn.compact
    def __call__(self, x, train: bool = False):
        nc = self.nchannels
        assert x.shape[1] == 160 and x.shape[2] == 64, (
            f"HACNN expects 160x64 input, got {x.shape[1]}x{x.shape[2]}"
        )
        x = ConvBlock(32, 3, s=2, p=1, name="conv")(x, train)

        locals_ = None
        sizes = [(24, 28), (12, 14), (6, 7)]
        feats = x
        prev_global = x
        for blk in range(3):
            y = InceptionA(nc[blk], name=f"inc{blk}a")(feats, train)
            y = InceptionB(nc[blk], name=f"inc{blk}b")(y, train)
            attn = SoftAttn(nc[blk], name=f"soft{blk}")(y, train)
            centers = HardAttn(name=f"hard{blk}")(y)
            out = y * attn
            if self.learn_region:
                # one local conv per block, shared by all four regions
                # (hacnn.py:254-257)
                local_conv = InceptionB(nc[blk], name=f"local{blk}")
                new_locals = []
                for r, theta in enumerate(self._theta(centers)):
                    t = _grid_sample(prev_global, theta, prev_global.shape[1:3])
                    t = _resize_ac(t, sizes[blk])
                    if locals_ is not None:
                        t = t + locals_[r]
                    new_locals.append(local_conv(t, train))
                locals_ = new_locals
            prev_global = out
            feats = out

        g = jnp.mean(feats, axis=(1, 2))
        g = nn.Dense(self.feat_dim_single, name="fc_global")(g)
        g = nn.relu(nn.BatchNorm(use_running_average=not train, name="fc_global_bn")(g))
        if not self.learn_region:
            return g
        loc = jnp.concatenate([jnp.mean(t, axis=(1, 2)) for t in locals_], axis=-1)
        loc = nn.Dense(self.feat_dim_single, name="fc_local")(loc)
        loc = nn.relu(nn.BatchNorm(use_running_average=not train, name="fc_local_bn")(loc))
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        loc = loc / jnp.maximum(jnp.linalg.norm(loc, axis=-1, keepdims=True), 1e-12)
        return jnp.concatenate([g, loc], axis=-1)


def build_hacnn() -> HACNN:
    return HACNN()
