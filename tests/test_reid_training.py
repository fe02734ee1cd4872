"""ReID training: losses, datasets, trainer smoke + resume, ranking eval."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boxmot_tpu.reid.datasets import Market1501, PKSampler, augment, load_dataset, make_batch
from boxmot_tpu.reid.training import losses as L
from boxmot_tpu.reid.training.evaluator import (
    compute_distance_matrix,
    evaluate_rank,
    evaluate_reid,
    re_ranking,
)
from boxmot_tpu.reid.training.trainer import ReIDTrainer, TrainConfig

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "reid-mini"

RNG = np.random.default_rng(0)


class TestLosses:
    def _feats(self, sep=3.0):
        rng = np.random.default_rng(42)
        a = rng.normal(0, 1, (4, 16)).astype(np.float32)
        feats = np.concatenate([a[:2] + sep, a[2:]])
        labels = np.array([0, 0, 1, 1])
        return jnp.asarray(feats), jnp.asarray(labels)

    def test_ce_smooth_matches_plain_ce_at_zero_eps(self):
        logits = jnp.asarray(RNG.normal(0, 1, (6, 10)).astype(np.float32))
        labels = jnp.asarray(RNG.integers(0, 10, 6))
        ce = float(L.cross_entropy_label_smooth(logits, labels, 0.0))
        import optax

        ref = float(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        )
        np.testing.assert_allclose(ce, ref, rtol=1e-5)

    def test_triplet_separable_lower_than_mixed(self):
        f_sep, labels = self._feats(sep=5.0)
        f_mix, _ = self._feats(sep=0.0)
        sep = float(L.triplet_loss(f_sep, labels))
        mix = float(L.triplet_loss(f_mix, labels))
        assert sep < mix

    def test_ms_and_circle_finite_and_ordered(self):
        f_sep, labels = self._feats(sep=5.0)
        f_mix, _ = self._feats(sep=0.0)
        for fn in (L.multi_similarity_loss, L.circle_loss):
            a, b = float(fn(f_sep, labels)), float(fn(f_mix, labels))
            assert np.isfinite(a) and np.isfinite(b)
            assert a < b

    def test_heads(self):
        feats = jnp.asarray(RNG.normal(0, 1, (8, 16)).astype(np.float32))
        labels = jnp.asarray(RNG.integers(0, 4, 8))
        for head_cls, kwargs in [
            (L.ArcFaceHead, {"num_classes": 4}),
            (L.CosFaceHead, {"num_classes": 4}),
            (L.CenterHead, {"num_classes": 4, "feat_dim": 16}),
        ]:
            head = head_cls(**kwargs)
            variables = head.init(jax.random.PRNGKey(0), feats, labels)
            loss = head.apply(variables, feats, labels)
            assert np.isfinite(float(loss))


class TestDatasets:
    def test_market_indexing(self):
        ds = Market1501(FIXTURE)
        assert len(ds.train) > 0
        assert ds.num_train_pids >= 2
        # relabeled pids are contiguous
        pids = sorted({pid for _, pid, _ in ds.train})
        assert pids == list(range(len(pids)))
        assert len(ds.query) > 0 and len(ds.gallery) > 0

    def test_pk_sampler_balance(self):
        ds = Market1501(FIXTURE)
        s = PKSampler(ds.train, p=2, k=2, seed=0)
        idxs = s.sample_batch()
        pids = [ds.train[i][1] for i in idxs]
        vals, counts = np.unique(pids, return_counts=True)
        assert np.all(counts == 2)

    def test_make_batch_and_augment(self):
        ds = Market1501(FIXTURE)
        rng = np.random.default_rng(0)
        imgs, pids = make_batch(ds.train, [0, 1], hw=(64, 32), rng=rng)
        assert imgs.shape == (2, 64, 32, 3)
        raw = np.zeros((64, 32, 3), np.float32)
        out = augment(raw, rng)
        assert out.shape == raw.shape


class TestTrainer:
    def _cfg(self, tmp_path, steps=6):
        return TrainConfig(
            model="osnet_x0_25",
            data_root=str(FIXTURE),
            crop_hw=(64, 32),
            p=2,
            k=2,
            steps=steps,
            warmup_steps=2,
            ckpt_dir=str(tmp_path),
            seed=0,
        )

    def test_training_advances(self, tmp_path):
        trainer = ReIDTrainer(self._cfg(tmp_path, steps=6))
        before = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, trainer.params))
        hist = trainer.fit(log_every=2)
        assert all(np.isfinite(h["loss"]) for h in hist)
        assert trainer.step == 6
        after = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, trainer.params))
        moved = any(not np.allclose(a, b) for a, b in zip(before, after))
        assert moved
        # checkpoint written at end of fit
        assert list(Path(tmp_path).glob("ckpt_*.pkl"))

    def test_resume_reproducibility(self, tmp_path):
        cfg = self._cfg(tmp_path, steps=8)
        t1 = ReIDTrainer(cfg)
        t1.fit(log_every=4)
        full = jax.tree.map(np.asarray, t1.params)

        t2 = ReIDTrainer(cfg)
        t2.fit(steps=4, log_every=4)
        ck = t2.save_checkpoint(tmp_path / "mid.pkl")
        t3 = ReIDTrainer(cfg)
        t3.load_checkpoint(ck)
        t3.fit(steps=8, log_every=4)
        resumed = jax.tree.map(np.asarray, t3.params)
        flat_a = jax.tree_util.tree_leaves(full)
        flat_b = jax.tree_util.tree_leaves(resumed)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(a, b, atol=1e-5)


class TestRankingEval:
    def test_perfect_features_rank1(self):
        # two identities with identical features per id across cameras
        qf = np.array([[1, 0], [0, 1]], np.float32)
        gf = np.array([[1, 0.01], [0.01, 1], [0.5, 0.5]], np.float32)
        dist = compute_distance_matrix(qf, gf)
        cmc, mAP = evaluate_rank(dist, [1, 2], [1, 2, 3], [0, 0], [1, 1, 1])
        assert cmc[0] == 1.0
        assert mAP == 1.0

    def test_same_camera_excluded(self):
        qf = np.array([[1, 0]], np.float32)
        gf = np.array([[1, 0], [0.9, 0.1]], np.float32)
        # first gallery is same pid same cam -> excluded; second is pid match
        dist = compute_distance_matrix(qf, gf)
        cmc, mAP = evaluate_rank(dist, [5], [5, 5], [0], [0, 1])
        assert cmc[0] == 1.0

    def test_rerank_runs(self):
        qf = RNG.normal(0, 1, (4, 8)).astype(np.float32)
        gf = RNG.normal(0, 1, (6, 8)).astype(np.float32)
        d = re_ranking(
            compute_distance_matrix(qf, gf),
            compute_distance_matrix(qf, qf),
            compute_distance_matrix(gf, gf),
        )
        assert d.shape == (4, 6)
        assert np.all(np.isfinite(d))

    def test_end_to_end_eval(self, tmp_path):
        ds = load_dataset("market1501", FIXTURE)
        from boxmot_tpu.models.osnet import build_osnet

        model = build_osnet("osnet_x0_25")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))
        res = evaluate_reid(model, variables, ds, hw=(64, 32))
        assert set(res) == {"rank1", "rank5", "mAP"}
        assert 0.0 <= res["mAP"] <= 1.0


class TestDatasetIndexers:
    @staticmethod
    def _img(path):
        import cv2

        path.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(path), np.zeros((64, 32, 3), np.uint8))

    def test_duke_layout(self, tmp_path):
        from boxmot_tpu.reid.datasets import load_dataset

        duke = tmp_path / "DukeMTMC-reID"
        for pid in (1, 2):
            for cam in (1, 2):
                self._img(duke / "bounding_box_train" / f"{pid:04d}_c{cam}_f0001.jpg")
        self._img(duke / "query" / "0001_c1_f0002.jpg")
        self._img(duke / "bounding_box_test" / "0001_c2_f0003.jpg")
        ds = load_dataset("duke", tmp_path)
        assert len(ds.train) == 4 and ds.num_train_pids == 2
        assert ds.train[0][1] == 0  # relabeled
        assert len(ds.query) == 1 and len(ds.gallery) == 1

    def test_veri_layout(self, tmp_path):
        from boxmot_tpu.reid.datasets import load_dataset

        veri = tmp_path / "VeRi"
        self._img(veri / "image_train" / "0005_c002_00030600_0.jpg")
        self._img(veri / "image_query" / "0005_c003_00030600_0.jpg")
        self._img(veri / "image_test" / "0005_c004_00030600_0.jpg")
        ds = load_dataset("veri776", tmp_path)
        assert (len(ds.train), len(ds.query), len(ds.gallery)) == (1, 1, 1)
        assert ds.query[0][2] == 2  # cam 003 -> 2

    def test_msmt17_list_files(self, tmp_path):
        from boxmot_tpu.reid.datasets import MSMT17, load_dataset

        ms = tmp_path / "MSMT17"
        self._img(ms / "train" / "0000" / "0000_000_01_0303morning_0015_0.jpg")
        self._img(ms / "test" / "0001" / "0001_000_02_0303morning_0015_0.jpg")
        (ms / "list_train.txt").write_text("0000/0000_000_01_0303morning_0015_0.jpg 0\n")
        (ms / "list_query.txt").write_text("0001/0001_000_02_0303morning_0015_0.jpg 1\n")
        (ms / "list_gallery.txt").write_text("0001/0001_000_02_0303morning_0015_0.jpg 1\n")
        ds = load_dataset("msmt17", ms)
        assert ds.train[0][2] == 0 and ds.query[0][2] == 1  # cam from field 3
        merged = MSMT17(ms, merged=True)
        assert len(merged.train) == 3 and merged.num_train_pids == 2

    def test_missing_dataset_raises(self, tmp_path):
        from boxmot_tpu.reid.datasets import load_dataset

        with pytest.raises(FileNotFoundError):
            load_dataset("duke", tmp_path)
        with pytest.raises(ValueError, match="unknown reid dataset"):
            load_dataset("imagenet", tmp_path)


class TestDataParallelTraining:
    """n_devices > 1 shards the P*K batch over a mesh; semantics stay
    global-batch-exact (grad all-reduce + global BN stats via SPMD)."""

    def _cfg(self, tmp_path, n_devices=0, steps=3):
        return TrainConfig(
            model="osnet_x0_25",
            data_root=str(FIXTURE),
            crop_hw=(64, 32),
            p=4,
            k=2,
            steps=steps,
            warmup_steps=1,
            ckpt_dir=str(tmp_path),
            seed=0,
            n_devices=n_devices,
        )

    def test_sharded_matches_single_device(self, tmp_path):
        # Semantics are global-batch-exact; only float reduction order
        # differs.  The first step must agree tightly; later steps drift
        # as adam amplifies the ~1e-5 per-op noise, so compare loosely.
        single = ReIDTrainer(self._cfg(tmp_path / "a"))
        h1 = single.fit(log_every=1)
        sharded = ReIDTrainer(self._cfg(tmp_path / "b", n_devices=4))
        assert sharded.mesh is not None
        h2 = sharded.fit(log_every=1)
        assert abs(h1[0]["loss"] - h2[0]["loss"]) < 1e-3, (h1[0], h2[0])
        for a, b in zip(h1, h2):
            assert np.isfinite(b["loss"])
            assert abs(a["loss"] - b["loss"]) < 0.05 * max(1.0, abs(a["loss"]))
        # params moved comparably (same trajectory up to fp drift)
        la = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, single.params))
        lb = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, sharded.params))
        assert all(np.allclose(x, y, atol=5e-3) for x, y in zip(la, lb))

    def test_batch_must_divide_devices(self, tmp_path):
        import pytest

        cfg = self._cfg(tmp_path, n_devices=3)  # effective batch 4, not divisible
        with pytest.raises(ValueError, match="divide"):
            ReIDTrainer(cfg)


class TestEvalDuringTraining:
    """Ranking eval wiring (reference evaluates every eval_interval
    epochs and snapshots the best mAP checkpoint, trainer.py:887-905)."""

    def _cfg(self, tmp_path, **over):
        base = dict(
            model="osnet_x0_25", data_root=str(FIXTURE), crop_hw=(64, 32),
            p=2, k=2, steps=2, warmup_steps=1, ckpt_dir=str(tmp_path), seed=0,
        )
        base.update(over)
        return TrainConfig(**base)

    def test_evaluate_method(self, tmp_path):
        t = ReIDTrainer(self._cfg(tmp_path))
        res = t.evaluate()
        assert set(res) == {"rank1", "rank5", "mAP"}
        assert all(0.0 <= v <= 1.0 for v in res.values())

    def test_periodic_eval_and_best_checkpoint(self, tmp_path):
        # epochs=2 with eval_interval=1 -> eval after each epoch
        t = ReIDTrainer(self._cfg(tmp_path, steps=0, epochs=2,
                                  warmup_epochs=1, eval_interval=1))
        hist = t.fit(log_every=10**9)
        evals = [h for h in hist if "mAP" in h]
        assert len(evals) == 2
        assert t.best_map >= 0
        assert (Path(tmp_path) / "best.pkl").exists()

    def test_flip_tta_changes_features_not_shapes(self, tmp_path):
        from boxmot_tpu.reid.training.evaluator import extract_features

        t = ReIDTrainer(self._cfg(tmp_path))
        items = t.dataset.query[:3]
        f0, p0, c0 = extract_features(
            t.model.backbone, t.backbone_variables(), items, hw=(64, 32)
        )
        f1, p1, c1 = extract_features(
            t.model.backbone, t.backbone_variables(), items, hw=(64, 32),
            flip_tta=True,
        )
        assert f0.shape == f1.shape
        assert not np.allclose(f0, f1)  # flip-averaged features differ
        assert np.array_equal(p0, p1) and np.array_equal(c0, c1)
