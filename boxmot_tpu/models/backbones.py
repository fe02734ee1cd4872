"""Additional ReID backbones: ResNet-50 and MobileNetV2 in Flax.

Broadens the MODEL_FACTORY family (reference factory.py:27-63 lists
resnet50/101, mobilenetv2, OSNet variants, LMBN, CLIP, ViTs...).  These
follow the torchreid ReID variants: ImageNet-style trunks with global
average pooling producing the backbone's natural feature dimension
(2048 for ResNet-50, 1280 for MobileNetV2).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class BottleneckBlock(nn.Module):
    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train, name=name)
        identity = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(
            self.filters, (3, 3), strides=self.stride, padding=[(1, 1)] * 2,
            use_bias=False, name="conv2",
        )(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = norm("bn3")(y)
        if identity.shape[-1] != self.filters * 4 or self.stride != 1:
            identity = nn.Conv(
                self.filters * 4, (1, 1), strides=self.stride, use_bias=False,
                name="downsample_conv",
            )(identity)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-50/101 trunk with last-stage stride 1 (the standard ReID
    modification keeping a 16x downsample for finer part features)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2, use_bias=False, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        filters = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            # ReID convention: final stage keeps stride 1
            stride = 1 if stage == 0 or stage == len(self.stage_sizes) - 1 else 2
            for b in range(n_blocks):
                x = BottleneckBlock(
                    filters, stride=stride if b == 0 else 1, name=f"layer{stage + 1}_{b}"
                )(x, train)
            filters *= 2
        return jnp.mean(x, axis=(1, 2))  # (N, 2048)


class InvertedResidual(nn.Module):
    filters: int
    stride: int = 1
    expand: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train, name=name)
        inp = x.shape[-1]
        hidden = inp * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, name="expand_conv")(y)
            y = nn.relu6(norm("expand_bn")(y))
        y = nn.Conv(
            hidden, (3, 3), strides=self.stride, padding=[(1, 1)] * 2,
            feature_group_count=hidden, use_bias=False, name="dw_conv",
        )(y)
        y = nn.relu6(norm("dw_bn")(y))
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name="project_conv")(y)
        y = norm("project_bn")(y)
        if self.stride == 1 and inp == self.filters:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    # width multiplier scales every stage (reference mobilenetv2.py:82-101:
    # channels = int(c * width_mult), feature_dim = int(1280 * w) if w > 1)
    width: float = 1.0

    @property
    def feature_dim(self) -> int:
        return int(1280 * self.width) if self.width > 1 else 1280

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        cfg = [  # (expand, filters, repeats, stride)
            (1, int(16 * w), 1, 1),
            (6, int(24 * w), 2, 2),
            (6, int(32 * w), 3, 2),
            (6, int(64 * w), 4, 2),
            (6, int(96 * w), 3, 1),
            (6, int(160 * w), 3, 2),
            (6, int(320 * w), 1, 1),
        ]
        x = nn.Conv(int(32 * w), (3, 3), strides=2, padding=[(1, 1)] * 2, use_bias=False, name="conv1")(x)
        x = nn.relu6(nn.BatchNorm(use_running_average=not train, name="bn1")(x))
        i = 0
        for expand, filters, repeats, stride in cfg:
            for r in range(repeats):
                x = InvertedResidual(
                    filters, stride=stride if r == 0 else 1, expand=expand,
                    name=f"block{i}",
                )(x, train)
                i += 1
        x = nn.Conv(self.feature_dim, (1, 1), use_bias=False, name="conv_last")(x)
        x = nn.relu6(nn.BatchNorm(use_running_average=not train, name="bn_last")(x))
        return jnp.mean(x, axis=(1, 2))  # (N, 1280)


def build_resnet50() -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3))


def build_resnet101() -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3))


def build_mobilenetv2(width: float = 1.0) -> MobileNetV2:
    return MobileNetV2(width=width)
