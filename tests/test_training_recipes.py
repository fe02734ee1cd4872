"""Training-recipe tier: configs/training/*.yaml + resolver + trainer knobs.

Mirrors the reference recipe surface (boxmot/configs/training/,
configs/__init__.py:35-153): flat recipes (lmbn_n, vit, osnet) and
nested hparams recipes (csl_tinyvit_*) both resolve to train kwargs;
`train --recipe` consumes them.
"""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.configs import (
    list_training_recipes,
    load_training_recipe,
    train_config_kwargs_from_recipe,
)
from boxmot_tpu.reid.training.trainer import ReIDTrainer, TrainConfig

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "reid-mini"

REFERENCE_RECIPES = {
    "csl_tinyvit_7m",
    "csl_tinyvit_11m",
    "csl_tinyvit_23m",
    "lmbn_n",
    "lmbn_n_market1501",
    "vit",
}


class TestRecipeLoading:
    def test_reference_recipe_set_present(self):
        names = set(list_training_recipes())
        assert REFERENCE_RECIPES <= names

    def test_unknown_recipe_raises(self):
        with pytest.raises(ValueError, match="unknown training recipe"):
            load_training_recipe("nope")

    def test_flat_recipe_maps_to_train_config(self):
        kwargs = train_config_kwargs_from_recipe(load_training_recipe("lmbn_n"))
        cfg = TrainConfig(**kwargs)
        assert cfg.model == "lmbn_n"
        assert cfg.crop_hw == (384, 128)
        assert cfg.base_lr == pytest.approx(3.5e-4)
        assert cfg.epochs == 150 and cfg.warmup_epochs == 10
        assert cfg.color_jitter and cfg.gaussian_blur
        assert cfg.random_grayscale == pytest.approx(0.1)
        assert cfg.center_loss_weight == pytest.approx(5e-4)
        # batch_size 64 with default k=4 -> p=16
        assert (cfg.p, cfg.k) == (16, 4)

    def test_ms_loss_recipe(self):
        kwargs = train_config_kwargs_from_recipe(
            load_training_recipe("lmbn_n_market1501")
        )
        cfg = TrainConfig(**kwargs)
        assert cfg.loss == "ms"
        assert (cfg.p, cfg.k) == (6, 8)
        assert cfg.triplet_margin == pytest.approx(0.7)
        assert cfg.eval_interval == 10

    def test_nested_recipe_flattens(self):
        kwargs = train_config_kwargs_from_recipe(
            load_training_recipe("csl_tinyvit_7m")
        )
        cfg = TrainConfig(**kwargs)
        assert cfg.model == "csl_tinyvit_7m"
        assert cfg.soft_margin is True
        assert cfg.center_loss_weight == pytest.approx(0.005)
        assert cfg.ce_weight == pytest.approx(1.0)
        assert (cfg.p, cfg.k) == (16, 4)
        assert cfg.epochs == 200 and cfg.warmup_epochs == 20
        assert cfg.weight_decay == pytest.approx(0.1)

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="unknown training-recipe key"):
            train_config_kwargs_from_recipe({"weird_knob": 1})

    def test_inapplicable_keys_dropped(self):
        kwargs = train_config_kwargs_from_recipe(
            {"random_patch": True, "preprocess": "resize", "lr": 1e-3}
        )
        assert kwargs == {"base_lr": 1e-3}

    def test_flip_tta_lifts(self):
        # consumed since the evaluator grew flip TTA
        kwargs = train_config_kwargs_from_recipe({"flip_tta": True})
        assert kwargs == {"flip_tta": True}


class TestTrainerKnobs:
    def _cfg(self, **over):
        base = dict(
            model="osnet_x0_25",
            data_root=str(FIXTURE),
            crop_hw=(64, 32),
            p=2,
            k=2,
            steps=2,
            warmup_steps=1,
            seed=0,
        )
        base.update(over)
        return TrainConfig(**base)

    def test_epochs_resolve_to_steps(self):
        trainer = ReIDTrainer(self._cfg(epochs=3, warmup_epochs=1))
        n_imgs = len(trainer.dataset.train)
        batch = min(2, trainer.num_classes) * 2
        spe = max(1, n_imgs // batch)
        assert trainer.cfg.steps == 3 * spe
        assert trainer.cfg.warmup_steps == spe

    def test_ms_loss_with_jitter_trains(self):
        trainer = ReIDTrainer(
            self._cfg(loss="ms", color_jitter=True, gaussian_blur=True,
                      random_grayscale=0.5)
        )
        hist = trainer.fit(log_every=1)
        assert all(np.isfinite(h["loss"]) for h in hist)

    def test_circle_loss_trains(self):
        trainer = ReIDTrainer(self._cfg(loss="circle"))
        hist = trainer.fit(log_every=1)
        assert all(np.isfinite(h["loss"]) for h in hist)

    def test_center_loss_creates_params_and_trains(self):
        trainer = ReIDTrainer(self._cfg(center_loss_weight=5e-4))
        assert "center" in trainer.params
        centers0 = np.asarray(trainer.params["center"]["centers"])
        hist = trainer.fit(log_every=1)
        assert all(np.isfinite(h["loss"]) for h in hist)
        centers1 = np.asarray(trainer.params["center"]["centers"])
        assert not np.allclose(centers0, centers1)

    def test_soft_margin_trains(self):
        trainer = ReIDTrainer(self._cfg(soft_margin=True))
        hist = trainer.fit(log_every=1)
        assert all(np.isfinite(h["loss"]) for h in hist)

    def test_factory_backbone_vit(self):
        trainer = ReIDTrainer(self._cfg(model="vit_nano", steps=1))
        hist = trainer.fit(log_every=1)
        assert all(np.isfinite(h["loss"]) for h in hist)

    def test_unknown_loss_rejected(self):
        with pytest.raises(ValueError, match="unknown metric loss"):
            ReIDTrainer(self._cfg(loss="l2"))

    def test_unknown_model_rejected(self):
        with pytest.raises(ValueError, match="unknown ReID model"):
            ReIDTrainer(self._cfg(model="resnext"))


class TestAugmentKnobs:
    def test_photometric_augment_stays_in_range(self):
        from boxmot_tpu.reid.datasets import augment

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (64, 32, 3)).astype(np.float32)
        for _ in range(8):
            out = augment(img, rng, color_jitter=True, gaussian_blur=True,
                          grayscale_p=0.5)
            assert out.shape == img.shape
            assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6

    def test_grayscale_collapses_channels(self):
        from boxmot_tpu.reid.datasets import augment

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (32, 16, 3)).astype(np.float32)
        out = augment(img, rng, pad=0, flip_p=0.0, erase_p=0.0,
                      grayscale_p=1.0)
        assert np.allclose(out[..., 0], out[..., 1])
        assert np.allclose(out[..., 1], out[..., 2])


class TestCliRecipe:
    def test_train_recipe_cli(self, tmp_path):
        from click.testing import CliRunner

        from boxmot_tpu.engine.cli import cli

        recipes = tmp_path / "r"
        recipes.mkdir()
        (recipes / "tiny.yaml").write_text(
            "model: osnet_x0_25\nloss: triplet\nepochs: 1\nlr: 0.001\n"
            "imgsz: [64, 32]\np_ids: 2\nk_instances: 2\n"
        )
        import boxmot_tpu.configs as C

        orig = C.TRAINING_RECIPES_DIR
        C.TRAINING_RECIPES_DIR = recipes
        try:
            result = CliRunner().invoke(
                cli,
                ["train", "--data", str(FIXTURE), "--recipe", "tiny",
                 "--ckpt-dir", str(tmp_path / "ck")],
                catch_exceptions=False,
            )
        finally:
            C.TRAINING_RECIPES_DIR = orig
        assert result.exit_code == 0, result.output
        assert list((tmp_path / "ck").glob("ckpt_*.pkl"))
