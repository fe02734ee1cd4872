"""Identity-classifier choices and part-head aux CE (reference
boxmot/engine/cli.py:857-863, reid/training/trainer.py:1781-1797)."""

from pathlib import Path

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxmot_tpu.reid.training.trainer import ReIDTrainer, TrainConfig

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "reid-mini"


def _cfg(**kw):
    base = dict(
        model="osnet_x0_25", data_root=str(FIXTURE), crop_hw=(64, 32),
        p=2, k=2, steps=2, warmup_steps=1, seed=0,
    )
    base.update(kw)
    return TrainConfig(**base)


class TestMarginClassifiers:
    @pytest.mark.parametrize("clf", ["arcface", "cosface"])
    def test_margin_head_trains(self, clf):
        t = ReIDTrainer(_cfg(classifier_loss=clf))
        assert "margin_head" in t.params and "classifier" not in t.params
        before = jax.tree.map(np.asarray, t.params)
        hist = t.fit(log_every=1)
        assert all(np.isfinite(h["loss"]) for h in hist)
        after = jax.tree.map(np.asarray, t.params)
        assert not np.array_equal(
            before["margin_head"]["weight"], after["margin_head"]["weight"]
        )

    def test_margin_head_is_head_and_no_wd(self):
        # reference marks the criterion-id group is_head with wd 0
        # (trainer.py:749-754)
        from boxmot_tpu.reid.training import optim as O

        params = {
            "backbone": {"block0": {"kernel": jnp.zeros((2, 2))}},
            "margin_head": {"weight": jnp.zeros((2, 4))},
        }
        fs, _ = O.window_scale_trees(params, 2.0)
        assert fs["margin_head"]["weight"] == 1.0
        assert O.wd_mask_tree(params)["margin_head"]["weight"] is False

    def test_unknown_classifier_raises(self):
        with pytest.raises(ValueError, match="unknown classifier loss"):
            ReIDTrainer(_cfg(classifier_loss="sphereface"))


class TestSoftmaxLoss:
    def test_metric_term_zero(self):
        t = ReIDTrainer(_cfg(loss="softmax"))
        hist = t.fit(log_every=1)
        assert all(h["triplet"] == 0.0 for h in hist)
        assert all(np.isfinite(h["loss"]) for h in hist)


class _StubParts(fnn.Module):
    """Tiny stand-in exposing the part_dims contract (ViTTinyParts,
    models/vit.py) without a real transformer."""

    part_dims: tuple = (4, 4, 4)

    @fnn.compact
    def __call__(self, x, train: bool = False):
        flat = x.reshape(x.shape[0], -1)
        return fnn.Dense(sum(self.part_dims), name="proj")(flat)


class TestPartHeads:
    @pytest.fixture()
    def stub_factory(self, monkeypatch):
        from boxmot_tpu.reid import core

        monkeypatch.setitem(core.MODEL_FACTORY, "stub_parts", _StubParts)
        return "stub_parts"

    def test_parts_backbone_gets_per_part_classifiers(self, stub_factory):
        # a part_dims backbone gets one classifier per segment
        t = ReIDTrainer(_cfg(model=stub_factory, steps=1))
        names = sorted(k for k in t.params if k.startswith("classifier"))
        assert names == ["classifier0", "classifier1", "classifier2"]

    def test_aux_ce_trains_and_drop_schedule(self, stub_factory):
        # trainer.py:1788-1797: (l0 + w*sum(aux)) / (1 + w*(n-1));
        # after aux_ce_drop_epoch the aux terms vanish (1586-1590)
        t = ReIDTrainer(_cfg(model=stub_factory, steps=2,
                             aux_ce_weight=0.5, aux_ce_drop_epoch=0))
        assert t._aux_drop_steps == 0
        hist = t.fit(log_every=1)
        assert all(np.isfinite(h["loss"]) for h in hist)

    def test_vit_tiny_parts_exposes_part_dims(self):
        from boxmot_tpu.models.vit import build_vit

        m = build_vit("vit_tiny_parts")
        assert m.part_dims == (512, 512, 512)
        m3 = build_vit("vit_tiny_parts3")
        assert m3.part_dims == (512,) * 4

    def test_single_feature_backbones_keep_plain_classifier(self):
        t = ReIDTrainer(_cfg(steps=1))
        assert "classifier" in t.params
        assert "classifier0" not in t.params


class TestRecipeLift:
    def test_classifier_keys(self):
        from boxmot_tpu.configs import (
            _flatten_nested_recipe,
            train_config_kwargs_from_recipe,
        )

        kwargs = train_config_kwargs_from_recipe(
            {"classifier_loss": "arcface", "arcface_scale": 64.0,
             "arcface_margin": 0.4, "aux_ce_weight": 0.5,
             "aux_ce_drop_epoch": 30}
        )
        assert kwargs["classifier_loss"] == "arcface"
        assert kwargs["arcface_scale"] == 64.0
        assert kwargs["aux_ce_drop_epoch"] == 30

        flat = _flatten_nested_recipe(
            {"losses": {
                "classifier_loss": "cosface",
                "weights": {"aux_ce_weight": 0.25},
                "aux_ce_drop_epoch": 10,
                "cosface": {"scale": 40.0, "margin": 0.3},
            }}
        )
        assert flat["classifier_loss"] == "cosface"
        assert flat["aux_ce_weight"] == 0.25
        assert flat["cosface_scale"] == 40.0
