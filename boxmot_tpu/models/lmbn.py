"""LMBN (Lightweight Multi-Branch Network) ReID backbones in Flax.

TPU-native re-implementation of the reference LMBN_n / LMBN_ain_n
(boxmot/reid/backbones/lmbn/lmbn_n.py:14-145, lmbn_ain_n.py): an OSNet
x1.0 trunk shared up to the first stage-3 block, then three branches
(global / partial / channel) each running the rest of the OSNet stages
with independent weights:

  * global branch: an extra OSBlock bottleneck (the Top-DB-Net drop
    block, a no-op at inference — attention.py:89-121) feeding two
    heads: max-pooled "drop" and avg-pooled "glo"
  * partial branch: a global max head plus two horizontal-half heads
  * channel branch: avg pool, channels split in half, each half mapped
    through a shared 1x1 conv + BN + ReLU to 512

Each head passes a BNNeck (1x1 reduction + BatchNorm, bnneck.py:6-96);
the inference embedding is the 7 BN'd features stacked channel-major,
(B, 512, 7) flattened to (B, 3584) exactly like the reference
(lmbn_n.py:127-133).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from boxmot_tpu.models.osnet import ConvBNReLU, OSBlock


class BNNeck3(nn.Module):
    """1x1 conv reduction + BatchNorm1d (bias frozen at 0) — bnneck.py:49-76."""

    feat_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):  # x: (B, D) pooled feature
        x = nn.Dense(self.feat_dim, use_bias=False, name="reduction")(x)
        return nn.BatchNorm(use_running_average=not train, use_bias=False, name="bn")(x)


class BNNeckBN(nn.Module):
    """BatchNorm1d-only neck (bnneck.py BNNeck:6-46)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, use_bias=False, name="bn")(x)


class _Branch(nn.Module):
    """conv3[1:] + transition + conv4 + conv5 with branch-local weights."""

    channels: tuple
    block_types: tuple  # types for (conv3_1, conv4_0, conv4_1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3, c4 = self.channels[2], self.channels[3]
        t = self.block_types
        x = OSBlock(c3, in_inside=t[0] == "in", name="conv3_1")(x, train)
        x = ConvBNReLU(c3, kernel=1, name="transition3")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = OSBlock(c4, in_inside=t[1] == "in", name="conv4_0")(x, train)
        x = OSBlock(c4, in_inside=t[2] == "in", name="conv4_1")(x, train)
        return ConvBNReLU(c4, kernel=1, name="conv5")(x, train)


class LMBN(nn.Module):
    """ain=False -> LMBN_n (osnet_x1_0 trunk); ain=True -> LMBN_ain_n
    (osnet_ain_x1_0 trunk: IN stem, OSBlockINin pattern)."""

    ain: bool = False
    channels: tuple = (64, 256, 384, 512)

    @property
    def feature_dim(self) -> int:
        return 7 * 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        # AIN block pattern (osnet_ain.py:511-527): stage2 = in,in;
        # stage3 = os,in; stage4 = in,os.  Plain LMBN uses os everywhere.
        s2 = ("in", "in") if self.ain else ("os", "os")
        branch_types = ("in", "in", "os") if self.ain else ("os", "os", "os")

        # shared trunk: conv1 + maxpool + conv2 + transition2 + conv3[0]
        x = ConvBNReLU(ch[0], kernel=7, stride=2, use_in=self.ain, name="conv1")(
            x, train
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = OSBlock(ch[1], in_inside=s2[0] == "in", name="conv2_0")(x, train)
        x = OSBlock(ch[1], in_inside=s2[1] == "in", name="conv2_1")(x, train)
        x = ConvBNReLU(ch[1], kernel=1, name="transition2")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = OSBlock(ch[2], name="conv3_0")(x, train)

        glo = _Branch(ch, branch_types, name="global_branch")(x, train)
        par = _Branch(ch, branch_types, name="partial_branch")(x, train)
        cha = _Branch(ch, branch_types, name="channel_branch")(x, train)

        # Top-DB drop block bottleneck; the drop itself is train-only,
        # so at inference glo_drop and glo share the bottleneck output.
        glo = OSBlock(512, name="drop_bottleneck")(glo, train)
        glo_drop = glo

        gmax = lambda t: jnp.max(t, axis=(1, 2))
        gavg = lambda t: jnp.mean(t, axis=(1, 2))
        H = par.shape[1]
        p_top = gavg(par[:, : H // 2])
        p_bot = gavg(par[:, H // 2 :])

        f_glo = BNNeck3(name="reduction_0")(gavg(glo), train)
        f_p0 = BNNeck3(name="reduction_1")(gmax(par), train)
        f_p1 = BNNeck3(name="reduction_2")(p_top, train)
        f_p2 = BNNeck3(name="reduction_3")(p_bot, train)
        f_glo_drop = BNNeck3(name="reduction_4")(gmax(glo_drop), train)

        # channel branch: split pooled channels, shared 1x1 -> 512
        c = gavg(cha)
        half = c.shape[-1] // 2
        shared_fc = nn.Dense(512, use_bias=False, name="shared_fc")
        shared_bn = nn.BatchNorm(use_running_average=not train, name="shared_bn")
        c0 = nn.relu(shared_bn(shared_fc(c[:, :half])))
        c1 = nn.relu(shared_bn(shared_fc(c[:, half:])))
        f_c0 = BNNeckBN(name="reduction_ch_0")(c0, train)
        f_c1 = BNNeckBN(name="reduction_ch_1")(c1, train)

        feats = [f_glo, f_glo_drop, f_p0, f_p1, f_p2, f_c0, f_c1]
        # stack(dim=2).flatten(1, 2): channel-major interleave (lmbn_n.py:128-132)
        return jnp.stack(feats, axis=2).reshape(x.shape[0], -1)


def build_lmbn(name: str) -> LMBN:
    if name == "lmbn_n":
        return LMBN(ain=False)
    if name == "lmbn_ain_n":
        return LMBN(ain=True)
    raise ValueError(f"unknown LMBN variant {name!r}")
