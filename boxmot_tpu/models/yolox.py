"""YOLOX detector (CSPDarknet + PAFPN + decoupled head) in Flax.

TPU-native implementation of the YOLOX family the reference's detector
backend loads from the external yolox package
(boxmot/detectors/yolox.py:113-320 wraps `exp.get_model()`): the
ByteTrack/BoxMOT benchmark detectors (yolox_x_MOT17_ablation etc.) are
this architecture with num_classes=1.

Structure (public YOLOX, Ge et al. 2021):
  * CSPDarknet: Focus stem (2x2 space-to-depth + conv), four dark
    stages of strided conv + CSP layers, SPP bottleneck in dark5
  * PAFPN: top-down upsample path + bottom-up downsample path over
    strides 8/16/32
  * Decoupled head per level: 1x1 stem, two-conv cls branch, two-conv
    reg branch, (4 reg, 1 obj, C cls) predictions

The head emits the raw (N_anchors, 5 + C) layout that
boxmot_tpu.ops.nms.yolox_decode turns into absolute boxes + sigmoid
scores, so forward + decode + NMS is one jitted device program.
Weights load from standard yolox torch checkpoints via convert_yolox.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

# (depth_mult, width_mult, depthwise)
YOLOX_VARIANTS = {
    "yolox_nano": (0.33, 0.25, True),
    "yolox_tiny": (0.33, 0.375, False),
    "yolox_s": (0.33, 0.5, False),
    "yolox_m": (0.67, 0.75, False),
    "yolox_l": (1.0, 1.0, False),
    "yolox_x": (1.33, 1.25, False),
}


class BaseConv(nn.Module):
    out: int
    ks: int = 1
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.ks - 1) // 2
        x = nn.Conv(
            self.out,
            (self.ks, self.ks),
            strides=self.stride,
            padding=[(p, p)] * 2,
            use_bias=False,
            feature_group_count=self.groups,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.silu(x)


class DWConv(nn.Module):
    out: int
    ks: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = BaseConv(c, self.ks, self.stride, groups=c, name="dconv")(x, train)
        return BaseConv(self.out, 1, name="pconv")(x, train)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out * self.expansion)
        y = BaseConv(hidden, 1, name="conv1")(x, train)
        conv2 = DWConv if self.depthwise else BaseConv
        y = conv2(self.out, 3, name="conv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.out else y


class CSPLayer(nn.Module):
    out: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out * self.expansion)
        a = BaseConv(hidden, 1, name="conv1")(x, train)
        b = BaseConv(hidden, 1, name="conv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                hidden, self.shortcut, 1.0, self.depthwise, name=f"m{i}"
            )(a, train)
        return BaseConv(self.out, 1, name="conv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class Focus(nn.Module):
    """2x2 space-to-depth then conv (yolox network_blocks.Focus)."""

    out: int
    ks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        tl = x[:, ::2, ::2]
        bl = x[:, 1::2, ::2]
        tr = x[:, ::2, 1::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return BaseConv(self.out, self.ks, name="conv")(x, train)


class SPPBottleneck(nn.Module):
    out: int
    kernels: tuple = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, name="conv1")(x, train)
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2)
            for k in self.kernels
        ]
        return BaseConv(self.out, 1, name="conv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class YOLOX(nn.Module):
    depth: float = 1.33
    width: float = 1.25
    depthwise: bool = False
    num_classes: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda c: int(c * self.width)
        d = lambda n: max(round(n * self.depth), 1)
        dw = self.depthwise
        Conv = DWConv if dw else BaseConv

        # ---- CSPDarknet
        x = Focus(w(64), name="stem")(x, train)
        x = Conv(w(128), 3, 2, name="dark2_conv")(x, train)
        x = CSPLayer(w(128), d(3), depthwise=dw, name="dark2_csp")(x, train)
        x = Conv(w(256), 3, 2, name="dark3_conv")(x, train)
        c3 = CSPLayer(w(256), d(9), depthwise=dw, name="dark3_csp")(x, train)
        x = Conv(w(512), 3, 2, name="dark4_conv")(c3, train)
        c4 = CSPLayer(w(512), d(9), depthwise=dw, name="dark4_csp")(x, train)
        x = Conv(w(1024), 3, 2, name="dark5_conv")(c4, train)
        x = SPPBottleneck(w(1024), name="dark5_spp")(x, train)
        c5 = CSPLayer(w(1024), d(3), shortcut=False, depthwise=dw, name="dark5_csp")(
            x, train
        )

        # ---- PAFPN
        up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
        lat5 = BaseConv(w(512), 1, name="lateral_conv0")(c5, train)
        p4 = CSPLayer(w(512), d(3), shortcut=False, depthwise=dw, name="C3_p4")(
            jnp.concatenate([up(lat5), c4], axis=-1), train
        )
        lat4 = BaseConv(w(256), 1, name="reduce_conv1")(p4, train)
        p3 = CSPLayer(w(256), d(3), shortcut=False, depthwise=dw, name="C3_p3")(
            jnp.concatenate([up(lat4), c3], axis=-1), train
        )
        d3 = Conv(w(256), 3, 2, name="bu_conv2")(p3, train)
        n3 = CSPLayer(w(512), d(3), shortcut=False, depthwise=dw, name="C3_n3")(
            jnp.concatenate([d3, lat4], axis=-1), train
        )
        d4 = Conv(w(512), 3, 2, name="bu_conv1")(n3, train)
        n4 = CSPLayer(w(1024), d(3), shortcut=False, depthwise=dw, name="C3_n4")(
            jnp.concatenate([d4, lat5], axis=-1), train
        )

        # ---- decoupled head over strides (8, 16, 32)
        head_w = w(256)
        outputs = []
        for lvl, feat in enumerate((p3, n3, n4)):
            y = BaseConv(head_w, 1, name=f"head_stem{lvl}")(feat, train)
            cls = Conv(head_w, 3, name=f"head_cls{lvl}_0")(y, train)
            cls = Conv(head_w, 3, name=f"head_cls{lvl}_1")(cls, train)
            reg = Conv(head_w, 3, name=f"head_reg{lvl}_0")(y, train)
            reg = Conv(head_w, 3, name=f"head_reg{lvl}_1")(reg, train)
            cls_out = nn.Conv(
                self.num_classes, (1, 1), name=f"head_cls_pred{lvl}"
            )(cls)
            reg_out = nn.Conv(4, (1, 1), name=f"head_reg_pred{lvl}")(reg)
            obj_out = nn.Conv(1, (1, 1), name=f"head_obj_pred{lvl}")(reg)
            B = feat.shape[0]
            lvl_out = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
            outputs.append(lvl_out.reshape(B, -1, 5 + self.num_classes))
        # raw layout for ops.nms.yolox_decode: stride-8 grid first
        return jnp.concatenate(outputs, axis=1)


def resolve_yolox_variant(name: str) -> str:
    """Strip benchmark suffixes (yolox_x_MOT17_ablation -> yolox_x),
    mirroring YoloXDetector's exp-name resolution (yolox.py:148-158)."""
    base = name
    for suffix in ("_mot17", "_mot20", "_dancetrack", "_visdrone", "_ablation"):
        if suffix in base.lower():
            base = base[: base.lower().index(suffix)]
    if base == "yolox_n":
        base = "yolox_nano"
    if base not in YOLOX_VARIANTS:
        raise ValueError(
            f"unknown YOLOX variant {name!r}; available: {sorted(YOLOX_VARIANTS)}"
        )
    return base


def build_yolox(name: str, num_classes: int = 1) -> YOLOX:
    depth, width, dw = YOLOX_VARIANTS[resolve_yolox_variant(name)]
    return YOLOX(depth=depth, width=width, depthwise=dw, num_classes=num_classes)


# ---------------------------------------------------------------------------
# Checkpoint conversion (yolox torch "model" state dicts)
# ---------------------------------------------------------------------------

_DARK = {
    "stem": ("backbone.backbone.stem.conv", "conv"),
    "dark2_conv": ("backbone.backbone.dark2.0", None),
    "dark2_csp": ("backbone.backbone.dark2.1", None),
    "dark3_conv": ("backbone.backbone.dark3.0", None),
    "dark3_csp": ("backbone.backbone.dark3.1", None),
    "dark4_conv": ("backbone.backbone.dark4.0", None),
    "dark4_csp": ("backbone.backbone.dark4.1", None),
    "dark5_conv": ("backbone.backbone.dark5.0", None),
    "dark5_spp": ("backbone.backbone.dark5.1", None),
    "dark5_csp": ("backbone.backbone.dark5.2", None),
    "lateral_conv0": ("backbone.lateral_conv0", None),
    "C3_p4": ("backbone.C3_p4", None),
    "reduce_conv1": ("backbone.reduce_conv1", None),
    "C3_p3": ("backbone.C3_p3", None),
    "bu_conv2": ("backbone.bu_conv2", None),
    "C3_n3": ("backbone.C3_n3", None),
    "bu_conv1": ("backbone.bu_conv1", None),
    "C3_n4": ("backbone.C3_n4", None),
}


def yolox_key_spec(name: str):
    """Yield (torch_key_prefix, flax_path, kind) for every weight tensor in
    build_yolox(name); kind is "conv" (conv weight [+bias]) or "bn".  Both
    the checkpoint converter and the torch-naming exporter walk this single
    traversal, so key coverage can't drift between the two directions."""
    depth, width, dw = YOLOX_VARIANTS[resolve_yolox_variant(name)]
    spec = []

    def conv_bn(tk, fpath):
        spec.append((f"{tk}.conv", (*fpath, "conv"), "conv"))
        spec.append((f"{tk}.bn", (*fpath, "bn"), "bn"))

    def base_or_dw(tk, fpath, is_dw):
        if is_dw:
            conv_bn(f"{tk}.dconv", (*fpath, "dconv"))
            conv_bn(f"{tk}.pconv", (*fpath, "pconv"))
        else:
            conv_bn(tk, fpath)

    def csp(tk, fpath, n, is_dw):
        conv_bn(f"{tk}.conv1", (*fpath, "conv1"))
        conv_bn(f"{tk}.conv2", (*fpath, "conv2"))
        conv_bn(f"{tk}.conv3", (*fpath, "conv3"))
        for i in range(n):
            conv_bn(f"{tk}.m.{i}.conv1", (*fpath, f"m{i}", "conv1"))
            base_or_dw(f"{tk}.m.{i}.conv2", (*fpath, f"m{i}", "conv2"), is_dw)

    d = lambda nmul: max(round(nmul * depth), 1)
    conv_bn("backbone.backbone.stem.conv", ("stem", "conv"))
    for fb, (tk, _) in _DARK.items():
        if fb == "stem":
            continue
        if fb.endswith("_csp") or fb.startswith("C3_"):
            n = d(9) if fb in ("dark3_csp", "dark4_csp") else d(3)
            csp(tk, (fb,), n, dw)
        elif fb == "dark5_spp":
            conv_bn(f"{tk}.conv1", (fb, "conv1"))
            conv_bn(f"{tk}.conv2", (fb, "conv2"))
        else:
            base_or_dw(tk, (fb,), dw and fb.startswith(("dark", "bu")))
    for lvl in range(3):
        conv_bn(f"head.stems.{lvl}", (f"head_stem{lvl}",))
        for i in range(2):
            base_or_dw(f"head.cls_convs.{lvl}.{i}", (f"head_cls{lvl}_{i}",), dw)
            base_or_dw(f"head.reg_convs.{lvl}.{i}", (f"head_reg{lvl}_{i}",), dw)
        spec.append((f"head.cls_preds.{lvl}", (f"head_cls_pred{lvl}",), "conv"))
        spec.append((f"head.reg_preds.{lvl}", (f"head_reg_pred{lvl}",), "conv"))
        spec.append((f"head.obj_preds.{lvl}", (f"head_obj_pred{lvl}",), "conv"))
    return spec


def convert_yolox(path_or_dict, name: str = "yolox_x", num_classes: int = 1):
    """Convert a yolox torch checkpoint ({"model": state_dict}) into Flax
    variables for build_yolox(name).  Maps the standard yolox module tree
    (backbone.backbone.darkN / backbone.* PAFPN / head.*)."""
    from boxmot_tpu.models.convert import _Mapper, load_state_dict

    sd = load_state_dict(path_or_dict)
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    m = _Mapper(sd)
    for tk, fpath, kind in yolox_key_spec(name):
        if kind == "bn":
            m.bn(tk, fpath)
        else:
            m.conv(tk, fpath)

    unused = [k for k in sd if k not in m.used and "num_batches_tracked" not in k]
    if unused:
        raise ValueError(f"unmapped yolox checkpoint keys: {unused[:8]}...")
    return {"params": m.params, "batch_stats": m.batch_stats}


def export_yolox(variables, name: str = "yolox_x") -> dict:
    """Inverse of convert_yolox: Flax variables -> torch-naming state dict
    (numpy arrays, OIHW conv layout).  Interop surface for the yolox
    ecosystem and the converter's coverage test."""
    import numpy as np

    params, batch_stats = variables["params"], variables["batch_stats"]

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    sd = {}
    for tk, fpath, kind in yolox_key_spec(name):
        if kind == "bn":
            sd[f"{tk}.weight"] = get(params, (*fpath, "scale"))
            sd[f"{tk}.bias"] = get(params, (*fpath, "bias"))
            sd[f"{tk}.running_mean"] = get(batch_stats, (*fpath, "mean"))
            sd[f"{tk}.running_var"] = get(batch_stats, (*fpath, "var"))
        else:
            node = params
            for p in fpath:
                node = node[p]
            # flax HWIO -> torch OIHW
            sd[f"{tk}.weight"] = np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1))
            if "bias" in node:
                sd[f"{tk}.bias"] = np.asarray(node["bias"])
    return sd
