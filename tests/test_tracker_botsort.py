"""BotSort SoA step: contract + embedding fusion + oracle parity + ECC CMC."""

import numpy as np
import jax.numpy as jnp
import pytest

from boxmot_tpu.motion.cmc import ECC, ecc_align
from boxmot_tpu.trackers.botsort import BotSort, BotSortConfig, botsort_step, init_state
from tests.oracle.botsort_np import BotSortOracle
from tests.test_tracker_bytetrack import moving_scene

IMG = np.zeros((480, 640, 3), np.uint8)
RNG = np.random.default_rng(5)


def embed_for(dets, dim=16, seed_base=0):
    """Deterministic per-position pseudo-embedding: nearby boxes give
    similar features across frames (identity-like)."""
    out = np.zeros((len(dets), dim), np.float32)
    for i, d in enumerate(dets):
        cx = (d[0] + d[2]) / 2
        cy = (d[1] + d[3]) / 2
        rng = np.random.default_rng(int(cx // 120) * 31 + int(cy // 120) * 7 + seed_base)
        out[i] = rng.normal(0, 1, dim)
    out /= np.linalg.norm(out, axis=1, keepdims=True) + 1e-12
    return out


def run_pair(frames, with_reid=True, **kw):
    trk = BotSort(with_reid=with_reid, use_cmc=False, capacity=64, **kw)
    trk.cfg = trk.cfg.__class__(**{**trk.cfg.__dict__, "feat_dim": 16})
    orc = BotSortOracle(with_reid=with_reid, **kw)
    outs_t, outs_o = [], []
    for dets in frames:
        embs = embed_for(dets) if with_reid else None
        outs_t.append(np.asarray(trk.update(dets, IMG, embs=embs)))
        outs_o.append(orc.update(dets, embs=embs))
    return outs_t, outs_o


def by_id(rows):
    return {int(r[4]): r for r in rows}


class TestContract:
    def test_shapes_and_ids(self):
        trk = BotSort(with_reid=False, use_cmc=False)
        dets = np.array(
            [[10, 10, 60, 100, 0.9, 0.0], [300, 50, 360, 170, 0.8, 0.0]], np.float32
        )
        out = trk.update(dets, IMG)
        assert out.shape == (2, 8)
        assert sorted(out.id.astype(int)) == [1, 2]

    def test_new_track_thresh(self):
        trk = BotSort(with_reid=False, use_cmc=False, new_track_thresh=0.7)
        dets = np.array([[10, 10, 60, 100, 0.65, 0.0]], np.float32)
        out = trk.update(dets, IMG)
        assert out.shape[0] == 0  # above high_thresh but below new_track_thresh

    def test_embedding_rescue_when_iou_fails(self):
        """A large jump breaks IoU matching but appearance keeps the id."""
        cfg_kw = dict(with_reid=True, use_cmc=False, capacity=64)
        trk = BotSort(**cfg_kw)
        trk.cfg = trk.cfg.__class__(**{**trk.cfg.__dict__, "feat_dim": 8})
        f0 = np.array([1.0, 0, 0, 0, 0, 0, 0, 0], np.float32)
        d1 = np.array([[100, 100, 160, 220, 0.9, 0.0]], np.float32)
        trk.update(d1, IMG, embs=f0[None])
        trk.update(d1, IMG, embs=f0[None])
        # proximity gate: iou overlap must still exist; move within overlap
        d2 = np.array([[130, 120, 190, 240, 0.9, 0.0]], np.float32)
        out = trk.update(d2, IMG, embs=f0[None])
        assert int(out.id[0]) == 1

    def test_reid_disabled_matches_iou_only(self):
        trk = BotSort(with_reid=False, use_cmc=False)
        d = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        for _ in range(3):
            out = trk.update(d, IMG)
        assert int(out.id[0]) == 1


class TestOracleParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_motion_only_parity(self, seed):
        frames = moving_scene(n_frames=35, seed=seed)
        outs_t, outs_o = run_pair(frames, with_reid=False)
        mismatch = 0
        for rt, ro in zip(outs_t, outs_o):
            if set(by_id(rt)) != set(by_id(ro)):
                mismatch += 1
                continue
            for tid, row in by_id(rt).items():
                np.testing.assert_allclose(row[:4], by_id(ro)[tid][:4], atol=0.6, rtol=1e-3)
        assert mismatch <= 1

    @pytest.mark.parametrize("seed", [0, 1])
    def test_with_reid_parity(self, seed):
        frames = moving_scene(n_frames=30, seed=seed)
        outs_t, outs_o = run_pair(frames, with_reid=True)
        mismatch = 0
        for rt, ro in zip(outs_t, outs_o):
            if set(by_id(rt)) != set(by_id(ro)):
                mismatch += 1
        assert mismatch <= 1


class TestEccCMC:
    def test_recovers_translation(self):
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (120, 160)).astype(np.float32)
        # smooth the noise so gradients are informative
        k = np.ones((5, 5)) / 25.0
        from scipy.signal import convolve2d

        base = convolve2d(base, k, mode="same")
        shifted = np.roll(np.roll(base, 3, axis=0), -5, axis=1)
        warp = np.asarray(ecc_align(jnp.asarray(base), jnp.asarray(shifted), 60))
        # warp maps prev coords -> curr coords: shift by (dx=-5, dy=+3)
        np.testing.assert_allclose(warp[0, 2], -5.0, atol=0.35)
        np.testing.assert_allclose(warp[1, 2], 3.0, atol=0.35)

    def test_identity_on_static(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (100, 100)).astype(np.float32)
        warp = np.asarray(ecc_align(jnp.asarray(img), jnp.asarray(img), 30))
        np.testing.assert_allclose(warp, np.eye(2, 3), atol=1e-2)

    def test_host_wrapper_statefulness(self):
        ecc = ECC(scale=1.0, max_iter=40)
        rng = np.random.default_rng(2)
        from scipy.signal import convolve2d

        base = convolve2d(
            rng.uniform(0, 255, (80, 120)), np.ones((5, 5)) / 25, mode="same"
        )
        img1 = np.repeat(base[:, :, None], 3, axis=2).astype(np.uint8)
        w1 = ecc.apply(img1)
        np.testing.assert_array_equal(w1, np.eye(2, 3))  # first frame
        shifted = np.roll(base, 4, axis=1)
        img2 = np.repeat(shifted[:, :, None], 3, axis=2).astype(np.uint8)
        w2 = ecc.apply(img2)
        # content shifted +4 in x: warp maps prev coords -> curr coords
        assert abs(w2[0, 2] - 4.0) < 0.5

    def test_warp_moves_track_state(self):
        # Feed BotSort a warp via a fake CMC and check the predicted box moves.
        cfg = BotSortConfig(with_reid=False, capacity=8, feat_dim=4)
        state = init_state(cfg)
        D = 8
        dets = np.zeros((D, 7), np.float32)
        dets[:, 2:4] = 1.0
        dets[:, 4] = -1.0
        dets[0] = [100, 100, 160, 220, 0.9, 0, 0]
        dv = dets[:, 4] >= 0
        ident = jnp.asarray(np.eye(2, 3).astype(np.float32))
        embs = jnp.zeros((D, 4), jnp.float32)
        state, _, _ = botsort_step(cfg, state, jnp.asarray(dets), jnp.asarray(dv), embs, ident)
        state, _, _ = botsort_step(cfg, state, jnp.asarray(dets), jnp.asarray(dv), embs, ident)
        shift = np.eye(2, 3).astype(np.float32)
        shift[0, 2] = 50.0
        # empty frame with a 50px x-shift warp: track mean must move +50
        empty = dets.copy()
        empty[0, 4] = -1.0
        state2, out, mask = botsort_step(
            cfg, state, jnp.asarray(empty), jnp.asarray(empty[:, 4] >= 0), embs,
            jnp.asarray(shift),
        )
        moved = float(state2.mean[0, 0] - state.mean[0, 0])
        assert 45.0 < moved < 55.0
