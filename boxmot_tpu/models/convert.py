"""Checkpoint conversion: torchreid-format state dicts -> Flax variables.

Replaces the reference's torch checkpoint loader
(boxmot/reid/core/registry.py:52-126: key normalization + load) with a
converter into {params, batch_stats} pytrees for the Flax backbones.
Accepts either a path to a torch .pt/.pth file or an already-loaded
mapping of numpy arrays.

Key mapping (torchreid osnet.py module names -> boxmot_tpu osnet names):
  conv1.*                        -> conv1.*
  conv{s}.{b}.*   (OSBlock)      -> conv{s}_{b}.*          s in 2..4
  conv{s}.{nb}.0.* (transition)  -> transition{s}.*
  conv2a / conv2b.{i} / ...      -> conv2_1_0 / conv2_2_{i} / ...
  conv5.*                        -> conv5.*
  fc.0 / fc.1                    -> fc / fc_bn
  classifier.*                   -> dropped (inference feature head only)
"""

from __future__ import annotations

import numpy as np


def load_state_dict(path_or_dict):
    """Load a checkpoint into {key: np.ndarray} with normalized keys."""
    if isinstance(path_or_dict, dict):
        sd = path_or_dict
    else:
        import torch

        ckpt = torch.load(path_or_dict, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
        sd = {k: v for k, v in sd.items()}
    # yolox checkpoints wrap the weights as {"model": state_dict, ...}
    if isinstance(sd.get("model"), dict):
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.").removeprefix("model.")
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _conv_kernel(w):
    """torch OIHW (or depthwise O1HW) -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


class _Mapper:
    def __init__(self, sd):
        self.sd = sd
        self.params = {}
        self.batch_stats = {}
        self.used = set()

    def conv(self, tk, fpath):
        w = self.sd[f"{tk}.weight"]
        self.used.add(f"{tk}.weight")
        _set(self.params, (*fpath, "kernel"), _conv_kernel(w))
        if f"{tk}.bias" in self.sd:
            self.used.add(f"{tk}.bias")
            _set(self.params, (*fpath, "bias"), self.sd[f"{tk}.bias"])

    def bn(self, tk, fpath):
        for name, dst, tree in [
            ("weight", "scale", self.params),
            ("bias", "bias", self.params),
            ("running_mean", "mean", self.batch_stats),
            ("running_var", "var", self.batch_stats),
        ]:
            self.used.add(f"{tk}.{name}")
            _set(tree, (*fpath, dst), self.sd[f"{tk}.{name}"])

    def conv_bn(self, tk, fpath):
        self.conv(f"{tk}.conv", (*fpath, "conv"))
        self.bn(f"{tk}.bn", (*fpath, "bn"))

    def light_conv(self, tk, fpath):
        self.conv(f"{tk}.conv1", (*fpath, "conv1"))
        self.conv(f"{tk}.conv2", (*fpath, "conv2"))
        self.bn(f"{tk}.bn", (*fpath, "bn"))

    def dense(self, tk, fpath):
        self.used.add(f"{tk}.weight")
        _set(self.params, (*fpath, "kernel"), self.sd[f"{tk}.weight"].T)
        if f"{tk}.bias" in self.sd:
            self.used.add(f"{tk}.bias")
            _set(self.params, (*fpath, "bias"), self.sd[f"{tk}.bias"])

    def inorm(self, tk, fpath):
        """InstanceNorm2d(affine=True): weight/bias only, no running stats."""
        self.used.add(f"{tk}.weight")
        self.used.add(f"{tk}.bias")
        _set(self.params, (*fpath, "scale"), self.sd[f"{tk}.weight"])
        _set(self.params, (*fpath, "bias"), self.sd[f"{tk}.bias"])

    def conv_in(self, tk, fpath):
        self.conv(f"{tk}.conv", (*fpath, "conv"))
        self.inorm(f"{tk}.bn", (*fpath, "in"))


def convert_checkpoint(path_or_dict, model_name: str):
    """Dispatch a torchreid checkpoint to the right converter by model."""
    if model_name.startswith("osnet_ain"):
        return convert_osnet_ain(path_or_dict)
    if model_name.startswith("osnet_ibn"):
        return convert_osnet(path_or_dict, ibn=True)
    if model_name.startswith("osnet"):
        return convert_osnet(path_or_dict)
    if model_name.startswith("clip"):
        return convert_clip(path_or_dict)["visual"]
    raise ValueError(
        f"no checkpoint converter for {model_name!r}; convert the weights "
        "offline or train with boxmot_tpu.reid.training"
    )


def convert_osnet(path_or_dict, blocks=(2, 2, 2), ibn: bool = False):
    """Convert a torchreid OSNet checkpoint to Flax variables.

    ibn=True handles osnet_ibn_x1_0 (osnet.py IN=True): the stem norm and
    the stage-2 post-residual norms are InstanceNorm2d (weight/bias only).
    """
    sd = load_state_dict(path_or_dict)
    m = _Mapper(sd)

    if ibn:
        m.conv_in("conv1", ("conv1",))
    else:
        m.conv_bn("conv1", ("conv1",))
    stream_lens = {1: "conv2a", 2: "conv2b", 3: "conv2c", 4: "conv2d"}
    for s in range(3):  # stages conv2..conv4
        tstage = f"conv{s + 2}"
        for b in range(blocks[s]):
            tb = f"{tstage}.{b}"
            fb = f"{tstage}_{b}"
            m.conv_bn(f"{tb}.conv1", (fb, "conv1"))
            for t in range(1, 5):
                tname = stream_lens[t]
                for u in range(t):
                    tk = f"{tb}.{tname}" if t == 1 else f"{tb}.{tname}.{u}"
                    m.light_conv(tk, (fb, f"conv2_{t}_{u}"))
            m.conv(f"{tb}.gate.fc1", (fb, "gate", "fc1"))
            m.conv(f"{tb}.gate.fc2", (fb, "gate", "fc2"))
            m.conv_bn(f"{tb}.conv3", (fb, "conv3"))
            if f"{tb}.downsample.conv.weight" in sd:
                m.conv_bn(f"{tb}.downsample", (fb, "downsample"))
            if ibn and s == 0:
                m.inorm(f"{tb}.IN", (fb, "ibn"))
        if s < 2:
            m.conv_bn(f"{tstage}.{blocks[s]}.0", (f"transition{s + 2}",))
    m.conv_bn("conv5", ("conv5",))
    m.dense("fc.0", ("fc",))
    m.bn("fc.1", ("fc_bn",))
    return _finish(m, sd)


def convert_osnet_ain(path_or_dict, blocks=(2, 2, 2)):
    """Convert a torchreid OSNet-AIN checkpoint (osnet_ain.py naming:
    LightConvStream `conv2.{t}.layers.{u}`, `pool2`/`pool3` transitions,
    OSBlockINin conv3 without BN + post-conv InstanceNorm)."""
    from boxmot_tpu.models.osnet import AIN_BLOCKS

    sd = load_state_dict(path_or_dict)
    m = _Mapper(sd)

    m.conv_in("conv1", ("conv1",))
    for s in range(3):
        tstage = f"conv{s + 2}"
        for b in range(blocks[s]):
            tb = f"{tstage}.{b}"
            fb = f"{tstage}_{b}"
            m.conv_bn(f"{tb}.conv1", (fb, "conv1"))
            for t in range(1, 5):
                for u in range(t):
                    m.light_conv(
                        f"{tb}.conv2.{t - 1}.layers.{u}", (fb, f"conv2_{t}_{u}")
                    )
            m.conv(f"{tb}.gate.fc1", (fb, "gate", "fc1"))
            m.conv(f"{tb}.gate.fc2", (fb, "gate", "fc2"))
            if AIN_BLOCKS[s][b] == "in":
                m.conv(f"{tb}.conv3.conv", (fb, "conv3"))
                m.inorm(f"{tb}.IN", (fb, "in3"))
            else:
                m.conv_bn(f"{tb}.conv3", (fb, "conv3"))
            if f"{tb}.downsample.conv.weight" in sd:
                m.conv_bn(f"{tb}.downsample", (fb, "downsample"))
        if s < 2:
            m.conv_bn(f"pool{s + 2}.0", (f"transition{s + 2}",))
    m.conv_bn("conv5", ("conv5",))
    m.dense("fc.0", ("fc",))
    m.bn("fc.1", ("fc_bn",))
    return _finish(m, sd)


def _finish(m, sd):
    unused = [
        k
        for k in sd
        if k not in m.used
        and not k.startswith("classifier")
        and "num_batches_tracked" not in k
    ]
    if unused:
        raise ValueError(f"unmapped checkpoint keys: {unused[:8]}...")
    return {"params": m.params, "batch_stats": m.batch_stats}


# ---------------------------------------------------------------------------
# CLIP (ViT text + visual towers)
# ---------------------------------------------------------------------------


def _resize_clip_pos_embed(pos, gh, gw):
    """Bilinear-resample a ViT positional embedding grid to (gh, gw).

    Same semantics as the reference's resize_pos_embed
    (clip/model.py:567-586: CLS row kept, square grid F.interpolate'd
    bilinearly, align_corners=False) so converted OpenAI weights match.
    """
    import jax

    pos = np.asarray(pos, np.float32)
    cls_row, grid = pos[:1], pos[1:]
    gs = round(len(grid) ** 0.5)
    if gs * gs != len(grid):
        raise ValueError(f"non-square source grid: {len(grid)} positions")
    if (gs, gs) != (gh, gw):
        grid = np.asarray(
            jax.image.resize(
                grid.reshape(gs, gs, -1), (gh, gw, grid.shape[-1]), "bilinear"
            )
        )
    return np.concatenate([cls_row, grid.reshape(gh * gw, -1)], axis=0)


def _convert_clip_blocks(m, prefix, fdst, n_layers):
    """Map transformer.resblocks.{i} (torch) -> resblock{i} (flax)."""
    for i in range(n_layers):
        tb = f"{prefix}transformer.resblocks.{i}"
        fb = (*fdst, f"resblock{i}")
        for ln in ("ln_1", "ln_2"):
            for name, dst in (("weight", "scale"), ("bias", "bias")):
                m.used.add(f"{tb}.{ln}.{name}")
                _set(m.params, (*fb, ln, dst), m.sd[f"{tb}.{ln}.{name}"])
        m.used.add(f"{tb}.attn.in_proj_weight")
        m.used.add(f"{tb}.attn.in_proj_bias")
        _set(m.params, (*fb, "qkv", "kernel"), m.sd[f"{tb}.attn.in_proj_weight"].T)
        _set(m.params, (*fb, "qkv", "bias"), m.sd[f"{tb}.attn.in_proj_bias"])
        m.dense(f"{tb}.attn.out_proj", (*fb, "out_proj"))
        m.dense(f"{tb}.mlp.c_fc", (*fb, "c_fc"))
        m.dense(f"{tb}.mlp.c_proj", (*fb, "c_proj"))


def convert_clip(path_or_dict, h_grid: int = 16, w_grid: int = 8):
    """Convert an OpenAI CLIP (or CLIP-ReID fine-tune) checkpoint.

    Replaces the reference's clip.build_model load path
    (boxmot/reid/backbones/clip/clip/model.py:471-561): infers tower
    sizes from the state dict, resamples the visual positional
    embedding to the ReID patch grid (default 16 x 8 for 256 x 128
    stride-16), and returns::

        {
          "visual": {params, batch_stats}   # for models.clip_reid.ClipReID
          "text":   {params}                # for ClipTextEncoder(context=77)
          "token_embedding": (vocab, width) # drives PromptLearner init
          "logit_scale": float,
          "prompt_cls_ctx": (num_cls, n_ctx, width) | None,  # fine-tunes
        }

    Accepts raw OpenAI full-CLIP key naming (visual.* / transformer.*)
    and CLIP-ReID build_transformer naming (image_encoder.* +
    bottleneck.* + prompt_learner.*, make_model_clipreid.py:101-130).
    """
    sd = load_state_dict(path_or_dict)
    # CLIP-ReID fine-tune naming -> OpenAI naming
    renamed = {}
    for k, v in sd.items():
        k = k.removeprefix("text_encoder.")
        if k.startswith("image_encoder."):
            k = "visual." + k.removeprefix("image_encoder.")
        renamed[k] = v
    sd = renamed
    for meta in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(meta, None)

    if "visual.proj" not in sd:
        raise ValueError("only ViT CLIP checkpoints are supported (no RN50)")
    v_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks")}
    )
    t_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )

    m = _Mapper(sd)
    # -- visual tower ------------------------------------------------------
    m.conv("visual.conv1", ("conv1",))
    for key, dst in (
        ("visual.class_embedding", "class_embedding"),
        ("visual.proj", "proj"),
    ):
        m.used.add(key)
        _set(m.params, (dst,), sd[key])
    m.used.add("visual.positional_embedding")
    _set(
        m.params,
        ("positional_embedding",),
        _resize_clip_pos_embed(sd["visual.positional_embedding"], h_grid, w_grid),
    )
    for ln in ("ln_pre", "ln_post"):
        for name, dst in (("weight", "scale"), ("bias", "bias")):
            m.used.add(f"visual.{ln}.{name}")
            _set(m.params, (ln, dst), sd[f"visual.{ln}.{name}"])
    _convert_clip_blocks(m, "visual.", (), v_layers)
    width = sd["visual.proj"].shape[0]
    proj_dim = sd["visual.proj"].shape[1]
    # BNNeck bottlenecks: present in CLIP-ReID fine-tunes, fresh otherwise
    for neck, dim in (("bottleneck", width), ("bottleneck_proj", proj_dim)):
        if f"{neck}.weight" in sd:
            m.used.add(f"{neck}.weight")
            _set(m.params, (neck, "scale"), sd[f"{neck}.weight"])
            for name, dst in (("running_mean", "mean"), ("running_var", "var")):
                m.used.add(f"{neck}.{name}")
                _set(m.batch_stats, (neck, dst), sd[f"{neck}.{name}"])
            m.used.add(f"{neck}.bias")  # zeros; flax neck is bias-free
        else:
            _set(m.params, (neck, "scale"), np.ones(dim, np.float32))
            _set(m.batch_stats, (neck, "mean"), np.zeros(dim, np.float32))
            _set(m.batch_stats, (neck, "var"), np.ones(dim, np.float32))
    visual = {"params": m.params, "batch_stats": m.batch_stats}

    # -- text tower --------------------------------------------------------
    mt = _Mapper(sd)
    mt.used = m.used  # shared consumption ledger
    _convert_clip_blocks(mt, "", (), t_layers)
    for key, dst in (
        ("positional_embedding", "positional_embedding"),
        ("text_projection", "text_projection"),
    ):
        mt.used.add(key)
        _set(mt.params, (dst,), sd[key])
    for name, dst in (("weight", "scale"), ("bias", "bias")):
        mt.used.add(f"ln_final.{name}")
        _set(mt.params, ("ln_final", dst), sd[f"ln_final.{name}"])

    mt.used.add("token_embedding.weight")
    mt.used.add("logit_scale")
    out = {
        "visual": visual,
        "text": {"params": mt.params},
        "token_embedding": np.asarray(sd["token_embedding.weight"], np.float32),
        "logit_scale": float(np.asarray(sd.get("logit_scale", 0.0))),
        "prompt_cls_ctx": None,
    }
    if "prompt_learner.cls_ctx" in sd:
        mt.used.add("prompt_learner.cls_ctx")
        out["prompt_cls_ctx"] = np.asarray(sd["prompt_learner.cls_ctx"], np.float32)
        # frozen template buffers are recomputed from the tokenizer
        mt.used.update(
            k for k in sd if k.startswith("prompt_learner.token_")
        )
    unused = [
        k
        for k in sd
        if k not in mt.used
        and not k.startswith("classifier")
        and "num_batches_tracked" not in k
    ]
    if unused:
        raise ValueError(f"unmapped CLIP checkpoint keys: {unused[:8]}...")
    return out


class _Exporter:
    def __init__(self, variables):
        self.params = variables["params"]
        self.stats = variables["batch_stats"]
        self.sd = {}

    def conv(self, fnode, tk):
        self.sd[f"{tk}.weight"] = np.transpose(
            np.asarray(fnode["kernel"]), (3, 2, 0, 1)
        )
        if "bias" in fnode:
            self.sd[f"{tk}.bias"] = np.asarray(fnode["bias"])

    def bn(self, pnode, snode, tk):
        self.sd[f"{tk}.weight"] = np.asarray(pnode["scale"])
        self.sd[f"{tk}.bias"] = np.asarray(pnode["bias"])
        self.sd[f"{tk}.running_mean"] = np.asarray(snode["mean"])
        self.sd[f"{tk}.running_var"] = np.asarray(snode["var"])

    def inorm(self, pnode, tk):
        self.sd[f"{tk}.weight"] = np.asarray(pnode["scale"])
        self.sd[f"{tk}.bias"] = np.asarray(pnode["bias"])

    def conv_bn(self, fname, tk):
        self.conv(self.params[fname]["conv"], f"{tk}.conv")
        self.bn(self.params[fname]["bn"], self.stats[fname]["bn"], f"{tk}.bn")

    def conv_in(self, fname, tk):
        self.conv(self.params[fname]["conv"], f"{tk}.conv")
        self.inorm(self.params[fname]["in"], f"{tk}.bn")

    def nested_conv_bn(self, fb, sub, tk):
        self.conv(self.params[fb][sub]["conv"], f"{tk}.conv")
        self.bn(self.params[fb][sub]["bn"], self.stats[fb][sub]["bn"], f"{tk}.bn")

    def light_conv(self, fb, sub, tk):
        node = self.params[fb][sub]
        snode = self.stats[fb][sub]
        self.conv(node["conv1"], f"{tk}.conv1")
        self.conv(node["conv2"], f"{tk}.conv2")
        self.bn(node["bn"], snode["bn"], f"{tk}.bn")

    def fc(self):
        self.sd["fc.0.weight"] = np.asarray(self.params["fc"]["kernel"]).T
        self.sd["fc.0.bias"] = np.asarray(self.params["fc"]["bias"])
        self.bn(self.params["fc_bn"], self.stats["fc_bn"], "fc.1")


def export_osnet_state_dict(variables, blocks=(2, 2, 2), ibn: bool = False):
    """Inverse mapping: Flax variables -> torchreid-style numpy state dict.

    Used by tests (round-trip) and by the exporters for interop.
    """
    e = _Exporter(variables)
    params = e.params

    if ibn:
        e.conv_in("conv1", "conv1")
    else:
        e.conv_bn("conv1", "conv1")
    stream = {1: "conv2a", 2: "conv2b", 3: "conv2c", 4: "conv2d"}
    for s in range(3):
        tstage = f"conv{s + 2}"
        for b in range(blocks[s]):
            fb = f"{tstage}_{b}"
            tb = f"{tstage}.{b}"
            e.nested_conv_bn(fb, "conv1", f"{tb}.conv1")
            for t in range(1, 5):
                for u in range(t):
                    tk = f"{tb}.{stream[t]}" if t == 1 else f"{tb}.{stream[t]}.{u}"
                    e.light_conv(fb, f"conv2_{t}_{u}", tk)
            e.conv(params[fb]["gate"]["fc1"], f"{tb}.gate.fc1")
            e.conv(params[fb]["gate"]["fc2"], f"{tb}.gate.fc2")
            e.nested_conv_bn(fb, "conv3", f"{tb}.conv3")
            if "downsample" in params[fb]:
                e.nested_conv_bn(fb, "downsample", f"{tb}.downsample")
            if ibn and s == 0:
                e.inorm(params[fb]["ibn"], f"{tb}.IN")
        if s < 2:
            e.conv_bn(f"transition{s + 2}", f"{tstage}.{blocks[s]}.0")
    e.conv_bn("conv5", "conv5")
    e.fc()
    return e.sd


def export_osnet_ain_state_dict(variables, blocks=(2, 2, 2)):
    """Inverse of convert_osnet_ain (osnet_ain.py key naming)."""
    from boxmot_tpu.models.osnet import AIN_BLOCKS

    e = _Exporter(variables)
    params = e.params

    e.conv_in("conv1", "conv1")
    for s in range(3):
        tstage = f"conv{s + 2}"
        for b in range(blocks[s]):
            fb = f"{tstage}_{b}"
            tb = f"{tstage}.{b}"
            e.nested_conv_bn(fb, "conv1", f"{tb}.conv1")
            for t in range(1, 5):
                for u in range(t):
                    e.light_conv(
                        fb, f"conv2_{t}_{u}", f"{tb}.conv2.{t - 1}.layers.{u}"
                    )
            e.conv(params[fb]["gate"]["fc1"], f"{tb}.gate.fc1")
            e.conv(params[fb]["gate"]["fc2"], f"{tb}.gate.fc2")
            if AIN_BLOCKS[s][b] == "in":
                e.conv(params[fb]["conv3"], f"{tb}.conv3.conv")
                e.inorm(params[fb]["in3"], f"{tb}.IN")
            else:
                e.nested_conv_bn(fb, "conv3", f"{tb}.conv3")
            if "downsample" in params[fb]:
                e.nested_conv_bn(fb, "downsample", f"{tb}.downsample")
        if s < 2:
            e.conv_bn(f"transition{s + 2}", f"pool{s + 2}.0")
    e.conv_bn("conv5", "conv5")
    e.fc()
    return e.sd
