"""Differential postprocessing parity vs the ACTUAL reference implementation.

GSI (boxmot/postprocessing/gsi.py:13-104), GBRC (gbrc.py:12-101) and GTA
(gta.py:276-666) all run in this environment (numpy/sklearn/torch-cpu; the
reference gta module's unused torchvision import is stubbed).  Each test
feeds identical synthetic MOT rows / tracklets to the reference functions
and the repo ports and asserts numerically identical outputs — closing the
"near-transcription, never cross-executed" watch-list item from VERDICT r1.
"""

import numpy as np
import pytest

from tests.refshim import load_reference, reference_available, stub_missing_modules

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

if reference_available():
    load_reference()
    stub_missing_modules("torchvision.transforms")


# ---------------------------------------------------------------------------
# synthetic MOT rows: (frame, id, x, y, w, h, conf, cls, det_ind)
# ---------------------------------------------------------------------------


def synth_mot_rows(seed=0, n_ids=6, n_frames=120, drop_p=0.25):
    rng = np.random.default_rng(seed)
    rows = []
    for tid in range(1, n_ids + 1):
        x, y = rng.uniform(50, 400, 2)
        vx, vy = rng.uniform(-2, 2, 2)
        w, h = rng.uniform(30, 60), rng.uniform(60, 120)
        start = int(rng.integers(1, 10))
        length = int(rng.integers(20, n_frames))
        for f in range(start, min(start + length, n_frames + 1)):
            if rng.uniform() < drop_p:
                continue  # gaps for the interpolator to fill
            rows.append(
                [
                    f,
                    tid,
                    x + vx * f + rng.normal(0, 1.0),
                    y + vy * f + rng.normal(0, 1.0),
                    w * rng.uniform(0.97, 1.03),
                    h * rng.uniform(0.97, 1.03),
                    rng.uniform(0.5, 1.0),
                    0,
                    -1,
                ]
            )
    # a 3-row degenerate short track (reference smooths it to its mean)
    for f in (4, 5, 6):
        rows.append([f, n_ids + 1, 200.0, 150.0, 40.0, 80.0, 0.9, 0, -1])
    return np.array(rows, np.float64)


# ---------------------------------------------------------------------------
# GSI
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("interval", [10, 20])
def test_gsi_linear_interpolation(seed, interval):
    from boxmot.postprocessing.gsi import linear_interpolation as ref_li

    from boxmot_tpu.postprocessing.gsi import linear_interpolation as repo_li

    data = synth_mot_rows(seed)
    ref = ref_li(data.copy(), interval)
    got = repo_li(data.copy(), interval)
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


@pytest.mark.parametrize("tau", [5.0, 10.0])
def test_gsi_gaussian_smooth(tau):
    from boxmot.postprocessing.gsi import gaussian_smooth as ref_gs
    from boxmot.postprocessing.gsi import linear_interpolation as ref_li

    from boxmot_tpu.postprocessing.gsi import gaussian_smooth as repo_gs

    data = ref_li(synth_mot_rows(2), 20)
    ref = ref_gs(data.copy(), tau)
    got = repo_gs(data.copy(), tau)
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_gsi_end_to_end_postprocessor():
    """Repo GSIPostprocessor == reference interpolate+smooth composition."""
    from boxmot.postprocessing.gsi import gaussian_smooth as ref_gs
    from boxmot.postprocessing.gsi import linear_interpolation as ref_li

    from boxmot_tpu.postprocessing.gsi import GSIPostprocessor

    data = synth_mot_rows(3)
    ref = ref_gs(ref_li(data.copy(), 20), 10.0)
    got = GSIPostprocessor(interval=20, tau=10.0)(data.copy())
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


# ---------------------------------------------------------------------------
# GBRC
# ---------------------------------------------------------------------------


def test_gbrc_gradient_boosting_smooth():
    from boxmot.postprocessing.gbrc import gradient_boosting_smooth as ref_gb
    from boxmot.postprocessing.gbrc import linear_interpolation as ref_li

    from boxmot_tpu.postprocessing.gbrc import gradient_boosting_smooth as repo_gb

    data = ref_li(synth_mot_rows(4), 20)
    ref = ref_gb(data.copy())
    got = repo_gb(data.copy())
    assert ref.shape == got.shape
    # sklearn GradientBoostingRegressor with subsample=1.0 is deterministic
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_gbrc_smooths_degenerate_short_tracks():
    """Tracks shorter than min_samples_split collapse to their column mean
    on BOTH sides (reference gbrc.py:75-77 'for consistency')."""
    from boxmot.postprocessing.gbrc import gradient_boosting_smooth as ref_gb

    from boxmot_tpu.postprocessing.gbrc import gradient_boosting_smooth as repo_gb

    rows = np.array(
        [
            [1, 1, 100.0, 50.0, 40.0, 80.0, 0.9, 0, -1],
            [2, 1, 110.0, 55.0, 42.0, 82.0, 0.9, 0, -1],
            [3, 1, 120.0, 60.0, 44.0, 84.0, 0.9, 0, -1],
        ]
    )
    ref = ref_gb(rows.copy())
    got = repo_gb(rows.copy())
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got[:, 2], np.full(3, 110.0), atol=1e-9)


# ---------------------------------------------------------------------------
# GTA (split + connect)
# ---------------------------------------------------------------------------


def _identity_embs(rng, base, n, noise=0.05):
    e = base[None, :] + rng.normal(0, noise, (n, base.size))
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def gta_scenario(seed=0, dim=16):
    """Three raw tracklets:

    - id 1: 240 frames, first half identity-A embeddings, second half
      identity-B (an ID switch for the splitter to cut);
    - id 2: 120 frames of identity-A later in time (merge candidate with
      the A-half of id 1);
    - id 3: 40 frames of identity-C (short: untouched by the splitter).

    Returns dict tid -> (times, scores, bboxes, classes, feats).
    """
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, (3, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    A, B, C = base

    def boxes(t0, n, x0, y0, vx, vy):
        return [
            [x0 + vx * i, y0 + vy * i, 40.0 + 0.01 * i, 80.0] for i in range(n)
        ]

    out = {}
    fa = _identity_embs(rng, A, 120)
    fb = _identity_embs(rng, B, 120)
    out[1] = (
        list(range(1, 241)),
        [0.9] * 240,
        boxes(1, 120, 100, 100, 1.0, 0.5) + boxes(121, 120, 220, 160, -1.0, 0.2),
        [0] * 240,
        [f for f in np.concatenate([fa, fb])],
    )
    out[2] = (
        list(range(300, 420)),
        [0.85] * 120,
        boxes(300, 120, 230, 170, 0.5, -0.2),
        [0] * 120,
        [f for f in _identity_embs(rng, A, 120)],
    )
    out[3] = (
        list(range(50, 90)),
        [0.8] * 40,
        boxes(50, 40, 400, 300, 0.0, 0.0),
        [0] * 40,
        [f for f in _identity_embs(rng, C, 40)],
    )
    return out


def _ref_tracklets(scenario):
    from boxmot.postprocessing import gta as rgta

    out = {}
    for tid, (times, scores, bboxes, classes, feats) in scenario.items():
        trk = rgta.Tracklet(tid)
        for f, s, b, c, e in zip(times, scores, bboxes, classes, feats):
            trk.append(f, s, list(b), c, np.asarray(e, np.float32))
        out[tid] = trk
    return out


def _repo_tracklets(scenario):
    from boxmot_tpu.postprocessing import gta as pgta

    return {
        tid: pgta.Tracklet(
            tid,
            list(times),
            list(scores),
            [list(b) for b in bboxes],
            list(classes),
            [np.asarray(e, np.float32) for e in feats],
        )
        for tid, (times, scores, bboxes, classes, feats) in scenario.items()
    }


def _partition(tracklets):
    """Identity partition as a set of frozensets of (frame, cx) keys —
    invariant to the (arbitrary) new-id numbering."""
    part = set()
    for trk in tracklets.values():
        part.add(
            frozenset(
                (int(t), round(b[0] + b[2] / 2, 4))
                for t, b in zip(trk.times, trk.bboxes)
            )
        )
    return part


@pytest.mark.parametrize("seed", [0, 7])
def test_gta_split_parity(seed):
    from boxmot.postprocessing import gta as rgta

    from boxmot_tpu.postprocessing import gta as pgta

    scenario = gta_scenario(seed)
    ref = rgta.split_tracklets(
        _ref_tracklets(scenario), eps=0.5, max_k=3, min_samples=10, len_thres=100
    )
    got = pgta.split_tracklets(
        _repo_tracklets(scenario), eps=0.5, max_k=3, min_samples=10, len_thres=100
    )
    assert _partition(got) == _partition(ref)
    # the mixed-identity tracklet must actually have been split
    assert len(ref) > len(scenario)


@pytest.mark.parametrize("seed", [0, 7])
def test_gta_split_then_merge_parity(seed):
    from boxmot.postprocessing import gta as rgta

    from boxmot_tpu.postprocessing import gta as pgta

    scenario = gta_scenario(seed)

    ref = rgta.split_tracklets(
        _ref_tracklets(scenario), eps=0.5, max_k=3, min_samples=10, len_thres=100
    )
    rx, ry = rgta.get_spatial_constraints(ref, 1.0)
    ref = rgta.merge_tracklets(ref, 0.4, rx, ry)

    got = pgta.split_tracklets(
        _repo_tracklets(scenario), eps=0.5, max_k=3, min_samples=10, len_thres=100
    )
    px, py = pgta.get_spatial_constraints(got, 1.0)
    assert (px, py) == pytest.approx((rx, ry), abs=1e-9)
    got = pgta.merge_tracklets(got, 0.4, px, py)

    assert _partition(got) == _partition(ref)
    # identity-A fragments must have merged back together across tracklets
    sizes = sorted(len(t.times) for t in ref.values())
    assert sizes == sorted(len(t.times) for t in got.values())
    assert max(sizes) >= 240  # 120 (A-half of id 1) + 120 (id 2)


def test_gta_distance_and_constraints_parity():
    from boxmot.postprocessing import gta as rgta

    from boxmot_tpu.postprocessing import gta as pgta

    scenario = gta_scenario(3)
    ref = _ref_tracklets(scenario)
    got = _repo_tracklets(scenario)
    tids = sorted(scenario)
    for i in range(len(tids)):
        for j in range(len(tids)):
            d_ref = rgta.get_distance(ref[tids[i]], ref[tids[j]])
            d_got = pgta.get_distance(got[tids[i]], got[tids[j]])
            assert d_got == pytest.approx(d_ref, abs=1e-5), (tids[i], tids[j])
    mx, my = rgta.get_spatial_constraints(ref, 0.2)
    for i in range(len(tids)):
        for j in range(i + 1, len(tids)):
            assert rgta.check_spatial_constraints(
                ref[tids[i]], ref[tids[j]], mx, my
            ) == pgta.check_spatial_constraints(got[tids[i]], got[tids[j]], mx, my)
