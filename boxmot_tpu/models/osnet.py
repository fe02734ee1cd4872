"""OSNet (Omni-Scale Network) ReID backbone in Flax.

TPU-native re-implementation of the architecture served by the
reference's MODEL_FACTORY (boxmot/reid/core/factory.py:27-63;
backbones at boxmot/reid/backbones/osnet.py) following the OSNet paper
(Zhou et al., ICCV 2019): omni-scale residual blocks with 1-4 stacked
lightweight depthwise-separable 3x3 streams fused by a shared channel
gate.  Inference-only (BatchNorm uses running statistics); weights come
from torchreid-format checkpoints via boxmot_tpu.models.convert.

Layout: NHWC, convs map onto the MXU; the whole forward for a frame's
worth of crops is one XLA program.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

# channels / blocks per variant (osnet.py / osnet_ain.py model zoos)
OSNET_VARIANTS = {
    "osnet_x1_0": ([64, 256, 384, 512], 1.0),
    "osnet_x0_75": ([48, 192, 288, 384], 0.75),
    "osnet_x0_5": ([32, 128, 192, 256], 0.5),
    "osnet_x0_25": ([16, 64, 96, 128], 0.25),
    "osnet_ibn_x1_0": ([64, 256, 384, 512], 1.0),
    "osnet_ain_x1_0": ([64, 256, 384, 512], 1.0),
    "osnet_ain_x0_75": ([48, 192, 288, 384], 0.75),
    "osnet_ain_x0_5": ([32, 128, 192, 256], 0.5),
    "osnet_ain_x0_25": ([16, 64, 96, 128], 0.25),
}

# AIN block pattern per stage (osnet_ain.py:511-527): "in" blocks apply
# instance norm inside the residual branch (OSBlockINin).
AIN_BLOCKS = (("in", "in"), ("os", "in"), ("in", "os"))
OS_BLOCKS = (("os", "os"), ("os", "os"), ("os", "os"))


def instance_norm(name: str):
    """InstanceNorm2d(affine=True) equivalent: per-channel normalization
    over the spatial axes (GroupNorm with one channel per group)."""
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, name=name)


class ConvBNReLU(nn.Module):
    out: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_in: bool = False  # instance norm instead of batch norm (ConvLayer IN)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            use_bias=False,
            feature_group_count=self.groups,
            name="conv",
        )(x)
        if self.use_in:
            x = instance_norm("in")(x)
        else:
            x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class Conv1x1Linear(nn.Module):
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out, (1, 1), strides=self.stride, use_bias=False, name="conv"
        )(x)
        return nn.BatchNorm(use_running_average=not train, name="bn")(x)


class LightConv3x3(nn.Module):
    """1x1 conv followed by a depthwise 3x3 (osnet.py LightConv3x3)."""

    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out, (1, 1), use_bias=False, name="conv1")(x)
        x = nn.Conv(
            self.out,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            feature_group_count=self.out,
            name="conv2",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class ChannelGate(nn.Module):
    """Shared aggregation gate: squeeze-excite with sigmoid output."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


class OSBlock(nn.Module):
    """Omni-scale residual block (osnet.py OSBlock / osnet_ain.py
    OSBlockINin).

    in_inside: instance norm replaces conv3's batch norm inside the
    residual branch (OSBlockINin, osnet_ain.py:261-296).
    ibn: instance norm applied to the residual sum before relu
    (osnet.py OSBlock IN=True, osnet.py:242-259).
    """

    out: int
    reduction: int = 4
    in_inside: bool = False
    ibn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out // self.reduction
        identity = x
        x1 = ConvBNReLU(mid, kernel=1, name="conv1")(x, train)
        gate = ChannelGate(mid, name="gate")
        x2 = None
        # stream t has t stacked LightConv3x3 units, t = 1..4
        for t in range(1, 5):
            y = x1
            for u in range(t):
                y = LightConv3x3(mid, name=f"conv2_{t}_{u}")(y, train)
            y = gate(y)
            x2 = y if x2 is None else x2 + y
        if self.in_inside:
            x3 = nn.Conv(self.out, (1, 1), use_bias=False, name="conv3")(x2)
            x3 = instance_norm("in3")(x3)
        else:
            x3 = Conv1x1Linear(self.out, name="conv3")(x2, train)
        if identity.shape[-1] != self.out:
            identity = Conv1x1Linear(self.out, name="downsample")(identity, train)
        out = x3 + identity
        if self.ibn:
            out = instance_norm("ibn")(out)
        return nn.relu(out)


class OSNet(nn.Module):
    """Full OSNet; returns L2-normalizable feature embeddings.

    channels: per-stage widths; blocks: OSBlocks per stage (2, 2, 2);
    feature_dim: fc embedding size (512 in all reference configs).
    """

    channels: Sequence[int] = (64, 256, 384, 512)
    blocks: Sequence[int] = (2, 2, 2)
    feature_dim: int = 512
    block_types: Sequence[Sequence[str]] = OS_BLOCKS  # "os" | "in" per block
    conv1_in: bool = False  # instance norm in the stem (AIN variants)
    ibn: bool = False  # stem IN + stage-2 post-residual IN (osnet_ibn_x1_0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # conv1: 7x7/2 + 3x3/2 maxpool
        x = ConvBNReLU(
            self.channels[0],
            kernel=7,
            stride=2,
            use_in=self.conv1_in or self.ibn,
            name="conv1",
        )(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        # stages 2..4
        for stage in range(3):
            for b in range(self.blocks[stage]):
                x = OSBlock(
                    self.channels[stage + 1],
                    in_inside=self.block_types[stage][b] == "in",
                    ibn=self.ibn and stage == 0,
                    name=f"conv{stage + 2}_{b}",
                )(x, train)
            if stage < 2:
                # transition: 1x1 conv + 2x2 average pool stride 2
                x = ConvBNReLU(
                    self.channels[stage + 1], kernel=1, name=f"transition{stage + 2}"
                )(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # conv5: 1x1
        x = ConvBNReLU(self.channels[3], kernel=1, name="conv5")(x, train)
        # global average pool + fc head
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.feature_dim, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train, name="fc_bn")(x)
        x = nn.relu(x)
        return x


def build_osnet(name: str) -> OSNet:
    try:
        channels, _ = OSNET_VARIANTS[name]
    except KeyError:
        raise ValueError(
            f"unknown OSNet variant {name!r}; available: {sorted(OSNET_VARIANTS)}"
        ) from None
    if name.startswith("osnet_ain"):
        return OSNet(channels=channels, block_types=AIN_BLOCKS, conv1_in=True)
    if name.startswith("osnet_ibn"):
        return OSNet(channels=channels, ibn=True)
    return OSNet(channels=channels)
