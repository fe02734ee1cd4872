"""Reference-parity optimizer profiles for ReID training.

The reference builds different optimizers by backbone kind
(boxmot/reid/training/trainer.py:740-792): ViT-family models train with
AdamW, global-norm gradient clipping at 1.0, a per-layer learning-rate
decay profile (``0.95 ** (depth + 1 - layer_id)``, trainer.py:1628-1646)
and no weight decay on bias/norm/token parameters (trainer.py:1664-1676);
CNN backbones train with Adam (L2-style weight decay folded into the
gradient) and no clipping.  The center-loss head has its own SGD at
lr=0.5 whose gradients are rescaled by ``1/center_loss_weight``
(trainer.py:776, 2028-2032).  Head warmup (trainer.py:1699-1735) trains
only head/neck parameters at ``base_lr * head_warmup_lr_mult`` for the
first N epochs; backbone freeze (trainer.py:1703-1727) zeroes backbone
updates while the necks/heads train at their normal rate.

The optax mapping: one ``multi_transform`` with a ``main`` chain
(clip -> adam(w) with a weight-decay mask -> lr schedule) and a
``center`` chain (``scale(1/center_w)`` -> ``sgd(center_lr)``).
Per-layer LR decay and the warmup/freeze windows become a per-leaf
update scale applied inside the jitted train step after ``tx.update``
— equivalent to torch per-group learning rates, since both scale the
fully-decayed update (AdamW's decoupled weight decay included, exactly
as a torch param group's ``lr`` does).

One deliberate divergence: torch freezes backbone parameters via
``requires_grad_(False)`` so Adam moments stop accumulating during
warmup windows; here moments keep integrating (the update is zeroed
after the fact).  The windows are short prefixes, and moments decay
exponentially, so post-window trajectories converge quickly.
"""

from __future__ import annotations

import re

import jax
import optax

# Model families that train under the reference's ViT profile
# (AdamW + clip 1.0 + layer-decay LR; trainer.py:746-765).
_VIT_PREFIXES = ("vit_", "csl_tinyvit", "clip")

# Parameters with no weight decay (reference no_wd_keywords,
# trainer.py:1664-1669) plus this repo's module spellings
# ("bottleneck" is ViTNano's BNNeck BatchNorm).
_NO_WD_KEYWORDS = (
    "bias", "cls_token", "pos_embed",
    "norm", "ln", "bn", "in_norm", "gate", "bottleneck",
    # the margin-classifier weight matrix is row-normalized in the loss,
    # so decay only shrinks its scale pointlessly (reference appends it
    # with weight_decay 0.0, trainer.py:749-754)
    "margin_head",
)

# Head/neck modules: trained during warmup/freeze windows and pinned to
# the base LR under layer decay (reference _is_reid_adaptation_param,
# trainer.py:1711-1713, matched to this repo's module names).
_HEAD_PREFIXES = (
    "classifier",                     # identity head (ReIDClassifier)
    "margin_head",                    # arcface/cosface weight matrix
    "bottleneck", "proj", "os_agg",   # ViTNano neck (models/vit.py)
    "neck_", "bn_global", "bn_part",  # CSL-TinyViT neck (models/csl_tinyvit.py)
    "head", "neck", "feature_fusion",  # reference spellings, future-proof
)

_BLOCK_RE = re.compile(r"^block(\d+)$")       # ViTNano blocks
_STAGE_RE = re.compile(r"^(?:s|merge)(\d+)")  # CSL-TinyViT stage blocks/merges
_STEM_PREFIXES = ("patch_embed", "cls_token", "pos_embed", "pe_conv")

# reid_lrd profile: staged scales for the first four blocks/stages
# (reference trainer.py:1634-1643).
_REID_LRD_SCALES = (0.05, 0.10, 0.25, 0.50)


def is_vit_model(name: str) -> bool:
    return name.startswith(_VIT_PREFIXES)


def resolve_profile(optimizer: str, grad_clip: float, model: str) -> tuple[str, float]:
    """Fill the auto sentinels: optimizer '' and grad_clip < 0 resolve by
    backbone family (reference trainer.py:746-774)."""
    vit = is_vit_model(model)
    opt = optimizer.lower() if optimizer else ("adamw" if vit else "adam")
    if opt not in ("adam", "adamw"):
        raise ValueError(f"unknown optimizer {opt!r}; supported: adam, adamw")
    clip = grad_clip if grad_clip >= 0 else (1.0 if vit else 0.0)
    return opt, clip


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def _is_head_path(parts: list[str]) -> bool:
    # top-level heads (classifier/classifier{i}/margin_head) sit beside
    # the backbone in the ReIDClassifier param tree
    if parts and parts[0] != "backbone":
        return parts[0].startswith(("classifier", "margin_head"))
    if len(parts) >= 2:
        return parts[1].startswith(_HEAD_PREFIXES)
    return False


def _layer_index(module: str) -> int | None:
    """Block/stage index for a backbone module name, None if stem/other."""
    m = _BLOCK_RE.match(module)
    if m:
        return int(m.group(1))
    m = _STAGE_RE.match(module)
    if m:
        return int(m.group(1))
    return None


def lr_scale_tree(params, profile: str, layer_decay: float):
    """Per-leaf LR scale implementing the reference ViT LR profiles.

    ``layer_decay``: stem at ``d ** (depth+1)`` ... last block at ``d``,
    heads/new modules at 1.0 (trainer.py:1628-1646).  ``reid_lrd``:
    staged 0.05/0.10/0.25/0.50 for the first four blocks, 1.0 beyond.
    ``none``: all ones.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # depth = number of distinct block/stage levels in the tree
    depth = 0
    for path, _ in flat:
        parts = _path_str(path).split("/")
        if len(parts) >= 2 and parts[0] == "backbone":
            idx = _layer_index(parts[1])
            if idx is not None:
                depth = max(depth, idx + 1)

    def scale_for(path) -> float:
        parts = _path_str(path).split("/")
        if profile == "none" or _is_head_path(parts):
            return 1.0
        if parts[0] != "backbone":
            return 1.0  # center head etc. keep base LR
        module = parts[1]
        if module.startswith(_STEM_PREFIXES):
            layer_id = 0
        else:
            idx = _layer_index(module)
            layer_id = depth + 1 if idx is None else idx + 1
        if profile == "reid_lrd":
            if layer_id == 0:
                return _REID_LRD_SCALES[0]
            if layer_id <= len(_REID_LRD_SCALES):
                return _REID_LRD_SCALES[layer_id - 1]
            return 1.0
        return layer_decay ** (depth + 1 - layer_id)

    return jax.tree_util.tree_map_with_path(lambda p, _: scale_for(p), params)


def wd_mask_tree(params):
    """True where weight decay applies (reference no-WD filtering,
    trainer.py:1664-1676; also used for the CNN profile's L2 term)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: not any(kw in _path_str(p).lower() for kw in _NO_WD_KEYWORDS),
        params,
    )


def head_mask_tree(params):
    """1.0 on head/neck leaves, 0.0 elsewhere (the warmup/freeze
    trainability set, reference trainer.py:1708-1727).  Center-loss
    leaves are 0: the center step is gated separately."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: 1.0 if _is_head_path(_path_str(p).split("/")) else 0.0,
        params,
    )


def window_scale_trees(params, head_warmup_lr_mult: float):
    """(freeze_scale, warmup_scale) per-leaf trees for the prefix windows.

    Backbone freeze: heads at base rate, backbone zeroed, the center
    head unaffected (the reference freeze only touches model params,
    trainer.py:1715-1727).  Head warmup: heads at ``base * mult``;
    center leaves nominally 1.0 — their gradients are already zeroed
    through the loss gate, so the scale never matters there.
    """
    def per_leaf(path, _, head_value):
        parts = _path_str(path).split("/")
        if parts[0] == "center":
            return 1.0
        return head_value if _is_head_path(parts) else 0.0

    freeze = jax.tree_util.tree_map_with_path(
        lambda p, x: per_leaf(p, x, 1.0), params
    )
    warmup = jax.tree_util.tree_map_with_path(
        lambda p, x: per_leaf(p, x, head_warmup_lr_mult), params
    )
    return freeze, warmup


def build_main_tx(opt: str, grad_clip: float, schedule, weight_decay: float):
    """The model-parameter chain (reference trainer.py:746-774).

    ``adamw``: decoupled decay (torch AdamW per-group semantics).
    ``adam``: L2 decay folded into the gradient before the moments,
    matching ``torch.optim.Adam(weight_decay=...)``.

    The weight-decay mask is the callable form so it recomputes against
    whatever (possibly multi_transform-masked) tree it is handed.
    """
    if opt == "adamw":
        core = optax.adamw(schedule, weight_decay=weight_decay, mask=wd_mask_tree)
    else:
        core = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask_tree),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )
    if grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(grad_clip), core)
    return core


def build_center_tx(center_loss_weight: float, center_lr: float):
    """SGD(center_lr) on gradients rescaled by 1/center_loss_weight
    (reference trainer.py:776, 2028-2032)."""
    return optax.chain(
        optax.scale(1.0 / center_loss_weight), optax.sgd(center_lr)
    )


def build_tx(opt, grad_clip, schedule, weight_decay, params,
             center_loss_weight: float = 0.0, center_lr: float = 0.5):
    """Full transform: main chain everywhere, center chain on the
    center-loss head when active."""
    main = build_main_tx(opt, grad_clip, schedule, weight_decay)
    if center_loss_weight <= 0 or "center" not in params:
        return main
    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: "center" if _path_str(p).split("/")[0] == "center" else "main",
        params,
    )
    return optax.multi_transform(
        {"main": main, "center": build_center_tx(center_loss_weight, center_lr)},
        labels,
    )
