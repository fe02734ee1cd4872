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

# channels / blocks per variant (osnet.py model zoo)
OSNET_VARIANTS = {
    "osnet_x1_0": ([64, 256, 384, 512], 1.0),
    "osnet_x0_75": ([48, 192, 288, 384], 0.75),
    "osnet_x0_5": ([32, 128, 192, 256], 0.5),
    "osnet_x0_25": ([16, 64, 96, 128], 0.25),
}


class ConvBNReLU(nn.Module):
    out: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1

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
    """Omni-scale residual block (osnet.py OSBlock)."""

    out: int
    reduction: int = 4

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
        x3 = Conv1x1Linear(self.out, name="conv3")(x2, train)
        if identity.shape[-1] != self.out:
            identity = Conv1x1Linear(self.out, name="downsample")(identity, train)
        return nn.relu(x3 + identity)


class OSNet(nn.Module):
    """Full OSNet; returns L2-normalizable feature embeddings.

    channels: per-stage widths; blocks: OSBlocks per stage (2, 2, 2);
    feature_dim: fc embedding size (512 in all reference configs).
    """

    channels: Sequence[int] = (64, 256, 384, 512)
    blocks: Sequence[int] = (2, 2, 2)
    feature_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        # conv1: 7x7/2 + 3x3/2 maxpool
        x = ConvBNReLU(self.channels[0], kernel=7, stride=2, name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        # stages 2..4
        for stage in range(3):
            for b in range(self.blocks[stage]):
                x = OSBlock(
                    self.channels[stage + 1], name=f"conv{stage + 2}_{b}"
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
    return OSNet(channels=channels)
