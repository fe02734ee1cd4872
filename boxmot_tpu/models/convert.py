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


def convert_osnet(path_or_dict, blocks=(2, 2, 2)):
    """Convert a torchreid OSNet checkpoint to Flax variables."""
    sd = load_state_dict(path_or_dict)
    m = _Mapper(sd)

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
        if s < 2:
            m.conv_bn(f"{tstage}.{blocks[s]}.0", (f"transition{s + 2}",))
    m.conv_bn("conv5", ("conv5",))
    m.dense("fc.0", ("fc",))
    m.bn("fc.1", ("fc_bn",))

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


def export_osnet_state_dict(variables, blocks=(2, 2, 2)):
    """Inverse mapping: Flax variables -> torchreid-style numpy state dict.

    Used by tests (round-trip) and by the exporters for interop.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    sd = {}

    def put_conv(fnode, tk):
        sd[f"{tk}.weight"] = np.transpose(np.asarray(fnode["kernel"]), (3, 2, 0, 1))
        if "bias" in fnode:
            sd[f"{tk}.bias"] = np.asarray(fnode["bias"])

    def put_bn(pnode, snode, tk):
        sd[f"{tk}.weight"] = np.asarray(pnode["scale"])
        sd[f"{tk}.bias"] = np.asarray(pnode["bias"])
        sd[f"{tk}.running_mean"] = np.asarray(snode["mean"])
        sd[f"{tk}.running_var"] = np.asarray(snode["var"])

    def put_conv_bn(fname, tk):
        put_conv(params[fname]["conv"], f"{tk}.conv")
        put_bn(params[fname]["bn"], stats[fname]["bn"], f"{tk}.bn")

    def put_nested_conv_bn(fb, sub, tk):
        put_conv(params[fb][sub]["conv"], f"{tk}.conv")
        put_bn(params[fb][sub]["bn"], stats[fb][sub]["bn"], f"{tk}.bn")

    put_conv_bn("conv1", "conv1")
    stream = {1: "conv2a", 2: "conv2b", 3: "conv2c", 4: "conv2d"}
    for s in range(3):
        tstage = f"conv{s + 2}"
        for b in range(blocks[s]):
            fb = f"{tstage}_{b}"
            tb = f"{tstage}.{b}"
            put_nested_conv_bn(fb, "conv1", f"{tb}.conv1")
            for t in range(1, 5):
                for u in range(t):
                    tk = f"{tb}.{stream[t]}" if t == 1 else f"{tb}.{stream[t]}.{u}"
                    node = params[fb][f"conv2_{t}_{u}"]
                    snode = stats[fb][f"conv2_{t}_{u}"]
                    put_conv(node["conv1"], f"{tk}.conv1")
                    put_conv(node["conv2"], f"{tk}.conv2")
                    put_bn(node["bn"], snode["bn"], f"{tk}.bn")
            put_conv(params[fb]["gate"]["fc1"], f"{tb}.gate.fc1")
            put_conv(params[fb]["gate"]["fc2"], f"{tb}.gate.fc2")
            put_nested_conv_bn(fb, "conv3", f"{tb}.conv3")
            if "downsample" in params[fb]:
                put_nested_conv_bn(fb, "downsample", f"{tb}.downsample")
        if s < 2:
            put_conv_bn(f"transition{s + 2}", f"{tstage}.{blocks[s]}.0")
    put_conv_bn("conv5", "conv5")
    sd["fc.0.weight"] = np.asarray(params["fc"]["kernel"]).T
    sd["fc.0.bias"] = np.asarray(params["fc"]["bias"])
    put_bn(params["fc_bn"], stats["fc_bn"], "fc.1")
    return sd
