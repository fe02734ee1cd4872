"""Reference-parity optimizer profiles (reid/training/optim.py).

Pins the semantics of boxmot/reid/training/trainer.py:740-792 (per-
backbone optimizer choice), 1628-1676 (ViT layer-decay LR + no-WD
filtering), 1699-1735 (head warmup / backbone freeze windows) and
776/2028-2032 (the center head's rescaled SGD)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from boxmot_tpu.reid.training import optim as O
from boxmot_tpu.reid.training.trainer import ReIDTrainer, TrainConfig

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "reid-mini"


def _leaves_equal(a, b) -> bool:
    return all(
        np.array_equal(x, y) for x, y in zip(tu.tree_leaves(a), tu.tree_leaves(b))
    )


class TestProfileResolution:
    def test_auto_by_family(self):
        # reference trainer.py:746-774: ViT-likes -> AdamW + clip 1.0,
        # CNNs -> Adam with no clipping
        assert O.resolve_profile("", -1.0, "vit_nano") == ("adamw", 1.0)
        assert O.resolve_profile("", -1.0, "csl_tinyvit_7m") == ("adamw", 1.0)
        assert O.resolve_profile("", -1.0, "clip") == ("adamw", 1.0)
        assert O.resolve_profile("", -1.0, "osnet_x0_25") == ("adam", 0.0)
        assert O.resolve_profile("", -1.0, "lmbn_n") == ("adam", 0.0)

    def test_explicit_overrides(self):
        assert O.resolve_profile("AdamW", 0.5, "osnet_x0_25") == ("adamw", 0.5)
        assert O.resolve_profile("adam", 0.0, "vit_nano") == ("adam", 0.0)

    def test_unknown_optimizer_raises(self):
        with pytest.raises(ValueError, match="unknown optimizer"):
            O.resolve_profile("lamb", -1.0, "vit_nano")


@pytest.fixture(scope="module")
def vit_params():
    from boxmot_tpu.reid.core import MODEL_FACTORY

    m = MODEL_FACTORY["vit_nano"]()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)), train=False)
    return {
        "backbone": v["params"],
        "classifier": {"kernel": jnp.zeros((2, 2)), "bias": jnp.zeros((2,))},
        "center": {"centers": jnp.zeros((4, 2))},
    }


@pytest.fixture(scope="module")
def csl_params():
    from boxmot_tpu.reid.core import MODEL_FACTORY

    m = MODEL_FACTORY["csl_tinyvit_7m"]()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 64, 3)), train=False)
    return {"backbone": v["params"], "classifier": {"kernel": jnp.zeros((2, 2))}}


class TestLrScaleTree:
    def test_vit_layer_decay(self, vit_params):
        # ViTNano has 6 blocks -> depth 6: stem at 0.95^7, block i at
        # 0.95^(6-i), neck/new modules at 1.0 (trainer.py:1644-1646)
        s = O.lr_scale_tree(vit_params, "layer_decay", 0.95)
        bb = s["backbone"]
        assert bb["patch_embed"]["proj"]["kernel"] == pytest.approx(0.95**7)
        assert bb["cls_token"] == pytest.approx(0.95**7)
        assert bb["pos_embed"] == pytest.approx(0.95**7)
        assert bb["block0"]["attn"]["qkv"]["kernel"] == pytest.approx(0.95**6)
        assert bb["block5"]["attn"]["qkv"]["kernel"] == pytest.approx(0.95)
        # final norm is a "new module": depth+1 -> scale 1.0
        assert tu.tree_leaves(bb["norm"])[0] == pytest.approx(1.0)
        assert tu.tree_leaves(bb["bottleneck"])[0] == pytest.approx(1.0)
        assert s["classifier"]["kernel"] == pytest.approx(1.0)
        assert s["center"]["centers"] == pytest.approx(1.0)

    def test_csl_stage_mapping(self, csl_params):
        # CSL-TinyViT decays per stage (reference names "layers.{i}",
        # trainer.py:1620-1626): 4 stages -> depth 4
        s = O.lr_scale_tree(csl_params, "layer_decay", 0.95)
        bb = s["backbone"]
        assert tu.tree_leaves(bb["pe_conv1"])[0] == pytest.approx(0.95**5)
        assert tu.tree_leaves(bb["s0_b0"])[0] == pytest.approx(0.95**4)
        assert tu.tree_leaves(bb["merge0"])[0] == pytest.approx(0.95**4)
        assert tu.tree_leaves(bb["s3_b1"])[0] == pytest.approx(0.95)
        # necks pinned to base LR
        assert tu.tree_leaves(bb["neck_conv1"])[0] == pytest.approx(1.0)
        assert tu.tree_leaves(bb["bn_global"])[0] == pytest.approx(1.0)

    def test_reid_lrd_staged(self, vit_params):
        # trainer.py:1634-1643: 0.05/0.10/0.25/0.50 staged, 1.0 beyond
        s = O.lr_scale_tree(vit_params, "reid_lrd", 0.95)
        bb = s["backbone"]
        assert bb["patch_embed"]["proj"]["kernel"] == pytest.approx(0.05)
        assert bb["block0"]["attn"]["qkv"]["kernel"] == pytest.approx(0.05)
        assert bb["block1"]["attn"]["qkv"]["kernel"] == pytest.approx(0.10)
        assert bb["block2"]["attn"]["qkv"]["kernel"] == pytest.approx(0.25)
        assert bb["block3"]["attn"]["qkv"]["kernel"] == pytest.approx(0.50)
        assert bb["block4"]["attn"]["qkv"]["kernel"] == pytest.approx(1.0)

    def test_none_profile_all_ones(self, vit_params):
        s = O.lr_scale_tree(vit_params, "none", 0.95)
        assert all(v == 1.0 for v in tu.tree_leaves(s))


class TestMasks:
    def test_wd_mask(self, vit_params):
        # trainer.py:1664-1669: no decay on bias/norm/token params
        m = O.wd_mask_tree(vit_params)
        bb = m["backbone"]
        assert bb["patch_embed"]["proj"]["kernel"] is True
        assert bb["patch_embed"]["proj"]["bias"] is False
        assert bb["cls_token"] is False
        assert bb["pos_embed"] is False
        assert all(v is False for v in tu.tree_leaves(bb["norm"]))
        assert all(v is False for v in tu.tree_leaves(bb["block0"]["norm1"]))
        assert bb["block0"]["attn"]["qkv"]["kernel"] is True
        assert m["classifier"]["kernel"] is True
        assert m["classifier"]["bias"] is False

    def test_window_trees(self, vit_params):
        fs, ws = O.window_scale_trees(vit_params, 2.0)
        # freeze: heads at 1.0, backbone zeroed, center untouched
        assert fs["classifier"]["kernel"] == 1.0
        assert tu.tree_leaves(fs["backbone"]["bottleneck"])[0] == 1.0
        assert fs["backbone"]["block0"]["attn"]["qkv"]["kernel"] == 0.0
        assert fs["center"]["centers"] == 1.0
        # warmup: heads boosted by the multiplier
        assert ws["classifier"]["kernel"] == 2.0
        assert tu.tree_leaves(ws["backbone"]["bottleneck"])[0] == 2.0
        assert ws["backbone"]["block0"]["attn"]["qkv"]["kernel"] == 0.0


class TestTrainerWindows:
    def _cfg(self, **kw):
        base = dict(
            model="vit_nano", data_root=str(FIXTURE), crop_hw=(64, 32),
            p=2, k=2, steps=2, warmup_steps=1, seed=0,
        )
        base.update(kw)
        return TrainConfig(**base)

    def test_head_warmup_trains_heads_only(self):
        # trainer.py:1715-1735: backbone frozen, heads at base*mult;
        # center loss paused (trainer.py:2012)
        t = ReIDTrainer(self._cfg(head_warmup_epochs=50, center_loss_weight=5e-3))
        assert t._head_warmup_steps > 2
        before = jax.tree.map(np.asarray, t.params)
        t.fit(log_every=1)
        after = jax.tree.map(np.asarray, t.params)
        assert _leaves_equal(before["backbone"]["block0"], after["backbone"]["block0"])
        assert not np.array_equal(
            before["classifier"]["kernel"], after["classifier"]["kernel"]
        )
        assert not _leaves_equal(
            before["backbone"]["bottleneck"], after["backbone"]["bottleneck"]
        )
        assert _leaves_equal(before["center"], after["center"])

    def test_backbone_freeze_lets_center_step(self):
        # trainer.py:1940-1957 + 2028-2032: freeze zeroes backbone
        # updates but the center head keeps its SGD steps
        t = ReIDTrainer(self._cfg(backbone_freeze_epochs=50, center_loss_weight=5e-3))
        before = jax.tree.map(np.asarray, t.params)
        t.fit(log_every=1)
        after = jax.tree.map(np.asarray, t.params)
        assert _leaves_equal(before["backbone"]["block0"], after["backbone"]["block0"])
        assert not _leaves_equal(before["center"], after["center"])
        assert not np.array_equal(
            before["classifier"]["kernel"], after["classifier"]["kernel"]
        )

    def test_cnn_profile_trains_everything(self):
        t = ReIDTrainer(self._cfg(model="osnet_x0_25", center_loss_weight=5e-3))
        # head warmup is a ViT concept; CNNs ignore it (trainer.py:1951-1956)
        assert t._head_warmup_steps == 0
        before = jax.tree.map(np.asarray, t.params)
        t.fit(log_every=1)
        after = jax.tree.map(np.asarray, t.params)
        assert not _leaves_equal(before["backbone"], after["backbone"])
        assert not _leaves_equal(before["center"], after["center"])

    def test_ms_loss_disables_center(self):
        # trainer.py:709-711
        t = ReIDTrainer(self._cfg(model="osnet_x0_25", loss="ms",
                                  center_loss_weight=5e-3, steps=1))
        assert t.cfg.center_loss_weight == 0
        assert "center" not in t.params


class TestRecipeMapping:
    def test_optimizer_keys_lift(self):
        from boxmot_tpu.configs import train_config_kwargs_from_recipe

        kwargs = train_config_kwargs_from_recipe(
            {
                "optimizer": "AdamW",
                "grad_clip": 1.0,
                "layer_decay": 0.9,
                "vit_lr_profile": "reid_lrd",
                "head_warmup_epochs": 5,
                "head_warmup_lr_mult": 2.0,
                "backbone_freeze_epochs": 3,
            }
        )
        assert kwargs["optimizer"] == "adamw"
        assert kwargs["grad_clip"] == 1.0
        assert kwargs["layer_decay"] == 0.9
        assert kwargs["vit_lr_profile"] == "reid_lrd"
        assert kwargs["head_warmup_epochs"] == 5
        assert kwargs["backbone_freeze_epochs"] == 3

    def test_nested_paths_lift(self):
        from boxmot_tpu.configs import _flatten_nested_recipe

        flat = _flatten_nested_recipe(
            {
                "optimization": {
                    "optimizer": "AdamW",
                    "grad_clip": 1.0,
                    "layer_decay": 0.95,
                    "backbone_freeze_epochs": 2,
                },
                "model": {"head": {"warmup_epochs": 4, "warmup_lr_mult": 2.0}},
            }
        )
        assert flat["optimizer"] == "AdamW"
        assert flat["grad_clip"] == 1.0
        assert flat["head_warmup_epochs"] == 4
        assert flat["backbone_freeze_epochs"] == 2
