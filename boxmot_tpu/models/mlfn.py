"""MLFN (Multi-Level Factorisation Net) ReID backbone in Flax.

TPU-native re-implementation of the reference MLFN
(boxmot/reid/backbones/mlfn.py:18-206; Chang et al., CVPR 2018):
a ResNeXt-style trunk of 16 factor-module blocks whose grouped 3x3
convolutions are gated per group by a factor-selection module (FSM);
the inference embedding averages a projection of the final feature map
with a projection of all 16 concatenated FSM signatures.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class MLFNBlock(nn.Module):
    out: int
    stride: int
    fsm_channels: tuple
    groups: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out // 2
        bn = lambda name: nn.BatchNorm(use_running_average=not train, name=name)
        residual = x

        # factor selection module: GAP -> two 1x1 conv+BN+ReLU -> sigmoid gates
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(bn("fsm_bn1")(nn.Conv(self.fsm_channels[0], (1, 1), name="fsm_conv1")(s)))
        s = nn.relu(bn("fsm_bn2")(nn.Conv(self.fsm_channels[1], (1, 1), name="fsm_conv2")(s)))
        s = nn.sigmoid(bn("fsm_bn3")(nn.Conv(self.groups, (1, 1), name="fsm_conv3")(s)))

        y = nn.relu(bn("fm_bn1")(nn.Conv(mid, (1, 1), use_bias=False, name="fm_conv1")(x)))
        y = nn.Conv(
            mid,
            (3, 3),
            strides=self.stride,
            padding=[(1, 1)] * 2,
            use_bias=False,
            feature_group_count=self.groups,
            name="fm_conv2",
        )(y)
        y = nn.relu(bn("fm_bn2")(y))
        # factor selection: channel c = g * n + i gets gate s[g]
        # (mlfn.py:76-82 repeat + permute layout)
        n = mid // self.groups
        y = y * jnp.repeat(s, n, axis=-1)
        y = nn.relu(bn("fm_bn3")(nn.Conv(self.out, (1, 1), use_bias=False, name="fm_conv3")(y)))

        if residual.shape[-1] != self.out or self.stride > 1:
            residual = nn.Conv(
                self.out, (1, 1), strides=self.stride, use_bias=False, name="down_conv"
            )(residual)
            residual = bn("down_bn")(residual)
        return nn.relu(residual + y), s


class MLFN(nn.Module):
    channels: tuple = (64, 256, 512, 1024, 2048)
    embed_dim: int = 1024
    groups: int = 32

    @property
    def feature_dim(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        x = nn.Conv(ch[0], (7, 7), strides=2, padding=[(3, 3)] * 2, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        spec = (  # (out, stride, fsm) per block (mlfn.py:125-147)
            [(ch[1], 1, (128, 64))] * 3
            + [(ch[2], 2, (256, 128))]
            + [(ch[2], 1, (256, 128))] * 3
            + [(ch[3], 2, (512, 128))]
            + [(ch[3], 1, (512, 128))] * 5
            + [(ch[4], 2, (512, 128))]
            + [(ch[4], 1, (512, 128))] * 2
        )
        sigs = []
        for i, (out, stride, fsm) in enumerate(spec):
            x, s = MLFNBlock(out, stride, fsm, self.groups, name=f"block{i}")(x, train)
            sigs.append(s[:, 0, 0, :])
        s_hat = jnp.concatenate(sigs, axis=-1)  # (B, 16 * groups)

        v_x = jnp.mean(x, axis=(1, 2))
        v_x = nn.Dense(self.embed_dim, use_bias=False, name="fc_x")(v_x)
        v_x = nn.relu(nn.BatchNorm(use_running_average=not train, name="fc_x_bn")(v_x))
        v_s = nn.Dense(self.embed_dim, use_bias=False, name="fc_s")(s_hat)
        v_s = nn.relu(nn.BatchNorm(use_running_average=not train, name="fc_s_bn")(v_s))
        return 0.5 * (v_x + v_s)


def build_mlfn() -> MLFN:
    return MLFN()
