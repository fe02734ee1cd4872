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
