"""BoostTrack: contract + boosting behaviors + oracle parity."""

import numpy as np
import pytest

from boxmot_tpu.trackers.boosttrack import BoostTrack
from tests.oracle.boosttrack_np import BoostTrackOracle

IMG = np.zeros((480, 640, 3), np.uint8)


def make(**kw):
    kw.setdefault("use_cmc", False)
    kw.setdefault("capacity", 64)
    kw.setdefault("det_thresh", 0.5)
    return BoostTrack(**kw)


def test_basic_contract():
    trk = make(min_hits=1)
    dets = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    out = trk.update(dets, IMG)
    assert out.shape == (1, 8)
    assert int(out.id[0]) == 1


def test_output_is_kf_state_box():
    # BoostTrack outputs the filter state, not the raw detection.
    trk = make(min_hits=1)
    d1 = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    out1 = trk.update(d1, IMG)
    np.testing.assert_allclose(np.asarray(out1)[0, :4], d1[0, :4], atol=0.5)
    d2 = np.array([[110, 100, 170, 260, 0.9, 0.0]], np.float32)
    out2 = trk.update(d2, IMG)
    # KF smoothing: box between previous state and measurement
    x1 = np.asarray(out2)[0, 0]
    assert 100.0 < x1 < 110.0


def test_aspect_ratio_filter():
    trk = make(min_hits=1, aspect_ratio_thresh=1.6)
    wide = np.array([[100, 100, 400, 160, 0.9, 0.0]], np.float32)  # w/h = 5
    out = trk.update(wide, IMG)
    assert out.shape[0] == 0


def test_min_box_area_filter():
    trk = make(min_hits=1, min_box_area=100)
    tiny = np.array([[100, 100, 105, 110, 0.9, 0.0]], np.float32)  # area 50
    out = trk.update(tiny, IMG)
    assert out.shape[0] == 0


def test_dlo_boost_rescues_faded_detection():
    """DLO: a low-conf det overlapping an existing track gets boosted."""
    trk = make(min_hits=1, use_duo_boost=False, det_thresh=0.5)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(d, IMG)
    faded = np.array([[101, 101, 161, 261, 0.2, 0.0]], np.float32)
    out = trk.update(faded, IMG)
    # iou ~1 -> boosted conf ~0.65 >= 0.5 -> still tracked with same id
    assert out.shape[0] == 1 and int(out.id[0]) == 1


def test_no_dlo_boost_drops_faded_detection():
    trk = make(min_hits=1, use_dlo_boost=False, use_duo_boost=False, det_thresh=0.5)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(d, IMG)
    faded = np.array([[101, 101, 161, 261, 0.2, 0.0]], np.float32)
    out = trk.update(faded, IMG)
    assert out.shape[0] == 0


def test_duo_boost_new_unexplained_detection():
    """DUO: a low-conf det far (in Mahalanobis) from all tracks gets
    lifted to det_thresh and starts a track."""
    trk = make(min_hits=1, use_dlo_boost=False, det_thresh=0.5)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    # converge the track covariance so the chi2 gate becomes meaningful
    for _ in range(6):
        trk.update(d, IMG)
    both = np.array(
        [[100, 100, 160, 260, 0.9, 0.0], [400, 300, 460, 460, 0.3, 0.0]], np.float32
    )
    trk.update(both, IMG)  # far det boosted by DUO, track created (streak 0)
    assert np.asarray(trk._state.active).sum() == 2
    # detector recovers: both high conf -> both tracks emitted
    both_high = both.copy()
    both_high[1, 4] = 0.9
    out = trk.update(both_high, IMG)
    assert out.shape[0] == 2

    # without DUO boost the same faded det never starts a track
    trk2 = make(min_hits=1, use_dlo_boost=False, use_duo_boost=False, det_thresh=0.5)
    for _ in range(6):
        trk2.update(d, IMG)
    trk2.update(both, IMG)
    assert np.asarray(trk2._state.active).sum() == 1


def boost_scene(n_frames=35, n_obj=6, seed=0, drop_p=0.12, low_conf_p=0.2):
    """Moving boxes with noise, dropouts, and fading confidences that
    exercise the DLO (faded overlapping det) and DUO (unexplained
    low-conf det) boost paths.  Always >= 1 det per frame."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(60, 420, (n_obj, 2))
    vel = rng.uniform(-3, 3, (n_obj, 2))
    size = rng.uniform(35, 70, (n_obj, 2))
    frames = []
    for f in range(n_frames):
        dets = []
        for i in range(n_obj):
            p = pos[i] + vel[i] * f
            if not (0 < p[0] < 560 and 0 < p[1] < 420):
                continue
            if f > 0 and rng.uniform() < drop_p:
                continue
            x1, y1 = p + rng.normal(0, 1.2, 2)
            w, h = size[i] * rng.uniform(0.96, 1.04, 2)
            conf = (
                rng.uniform(0.2, 0.45)
                if rng.uniform() < low_conf_p
                else rng.uniform(0.55, 0.95)
            )
            dets.append([x1, y1, x1 + w, y1 + h, conf, 0.0])
        if not dets:
            dets.append([250, 250, 300, 330, 0.8, 0.0])
        # occasional unexplained clutter det below det_thresh (DUO path)
        if rng.uniform() < 0.25:
            x1, y1 = rng.uniform(30, 500, 2)
            dets.append([x1, y1, x1 + 45, y1 + 70, rng.uniform(0.25, 0.45), 0.0])
        frames.append(np.array(dets, np.float32).reshape(-1, 6))
    return frames


def assert_frames_match(out_t, out_o, atol_box=0.35, atol_conf=2e-3):
    for f, (a, b) in enumerate(zip(out_t, out_o)):
        a, b = np.asarray(a, float), np.asarray(b, float)
        ids_a = sorted(int(r[4]) for r in a)
        ids_b = sorted(int(r[4]) for r in b)
        assert ids_a == ids_b, f"frame {f}: ids {ids_a} vs oracle {ids_b}"
        da = {int(r[4]): r for r in a}
        db = {int(r[4]): r for r in b}
        for tid in ids_a:
            np.testing.assert_allclose(
                da[tid][:4], db[tid][:4], atol=atol_box,
                err_msg=f"frame {f} id {tid} box",
            )
            assert abs(da[tid][5] - db[tid][5]) < atol_conf, (
                f"frame {f} id {tid} conf {da[tid][5]} vs {db[tid][5]}"
            )
            assert da[tid][6] == db[tid][6] and da[tid][7] == db[tid][7]


def run_parity(frames, embs=None, **kw):
    trk = make(**kw)
    orc = BoostTrackOracle(
        det_thresh=0.5,
        **{k: v for k, v in kw.items() if k not in ("capacity", "use_cmc", "reid_model")},
    )
    out_t, out_o = [], []
    for f, dets in enumerate(frames):
        e = None if embs is None else embs[f]
        out_t.append(np.asarray(trk.update(dets, IMG, embs=e)))
        out_o.append(orc.update(dets, embs=e))
    return out_t, out_o


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_oracle_parity_default(seed):
    frames = boost_scene(seed=seed)
    out_t, out_o = run_parity(frames)
    assert_frames_match(out_t, out_o)
    assert sum(len(o) for o in out_o) > 40  # scene actually produced tracks


def test_oracle_parity_boost_variants():
    """BoostTrack++ boosts: rich S, soft boost, varying threshold."""
    frames = boost_scene(seed=3)
    out_t, out_o = run_parity(
        frames, use_rich_s=True, use_sb=True, use_vt=True, s_sim_corr=True
    )
    assert_frames_match(out_t, out_o)


def test_oracle_parity_no_boosts():
    frames = boost_scene(seed=4)
    out_t, out_o = run_parity(frames, use_dlo_boost=False, use_duo_boost=False)
    assert_frames_match(out_t, out_o)


def test_oracle_parity_with_reid():
    """Embedding EMA + emb term in the association cost."""

    class _StubReID:
        feature_dim = 16

    rng = np.random.default_rng(7)
    frames = boost_scene(seed=5, n_obj=4, low_conf_p=0.1)
    # per-object stable unit embeddings keyed by nearest-center identity
    protos = rng.normal(size=(16, 16))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    embs = []
    for dets in frames:
        e = protos[
            (dets[:, :2].sum(1) / 60).astype(int) % 16
        ] + rng.normal(0, 0.02, (len(dets), 16))
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        embs.append(e.astype(np.float32))
    out_t, out_o = run_parity(
        frames, embs=embs, with_reid=True, reid_model=_StubReID()
    )
    assert_frames_match(out_t, out_o)


def test_min_hits_warmup():
    trk = make(min_hits=2)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(d, IMG)
    d2 = np.vstack([d, [[300, 300, 360, 460, 0.9, 0.0]]]).astype(np.float32)
    out3 = trk.update(d2, IMG)  # new track, streak 0, frame 3 > min_hits
    assert out3.shape[0] == 1
    out4 = trk.update(d2, IMG)
    assert out4.shape[0] == 1  # streak 1
    out5 = trk.update(d2, IMG)
    assert out5.shape[0] == 2  # streak 2
