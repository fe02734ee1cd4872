"""Differential parity: every tracker vs the ACTUAL reference implementation.

The reference tree (/root/reference) runs in this environment with the
scipy-backed `lap` shim in tests/refshim.  Each test drives the reference
tracker and the repo tracker frame-by-frame on the same inputs — MOT17-mini
detections plus long synthetic scenes with dropouts, occlusions and camera
pan — and asserts row-level parity: identical reported detections, boxes
within tolerance, and a globally consistent track-ID bijection.

This supersedes the hand-written numpy oracles in tests/oracle/ as the
source of truth for reference semantics (VERDICT round 1, item 2).
"""

import numpy as np
import pytest

from tests.refshim import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

if reference_available():
    load_reference()

# Static but textured frame: CMC methods (ECC etc.) converge to an identity
# warp on identical frames, so camera compensation is exercised as a no-op
# on both sides without coupling the test to ECC numerics.
_IMG_RNG = np.random.default_rng(1234)
IMG = _IMG_RNG.integers(0, 255, (480, 640, 3), dtype=np.uint8)
IMG.setflags(write=False)


# ---------------------------------------------------------------------------
# scenes
# ---------------------------------------------------------------------------


def moving_scene(
    n_frames=300,
    n_obj=8,
    seed=0,
    drop_p=0.12,
    low_conf_p=0.2,
    clutter_p=0.25,
    pan_amp=0.0,
    occlusion=False,
):
    """Linearly moving boxes with jitter/dropouts; optional sinusoidal camera
    pan (applied to all boxes, unmodeled — exercises lost/recover logic) and
    a pair of objects on crossing paths (occlusion).

    Returns (frames, ids): per-frame (N, 6) float32 dets and (N,) int
    ground-truth identity per det row (clutter rows get fresh ids).
    """
    rng = np.random.default_rng(seed)
    pos = rng.uniform(60, 480, (n_obj, 2))
    vel = rng.uniform(-3, 3, (n_obj, 2))
    size = rng.uniform(30, 80, (n_obj, 2))
    if occlusion and n_obj >= 2:
        # objects 0 and 1 swap positions through the scene midpoint
        pos[0], pos[1] = np.array([80.0, 200.0]), np.array([520.0, 220.0])
        vel[0] = (pos[1] - pos[0]) / max(n_frames - 1, 1)
        vel[1] = -vel[0]
        size[0] = size[1] = np.array([50.0, 90.0])
    frames, ids = [], []
    next_clutter = n_obj
    for f in range(n_frames):
        pan = pan_amp * np.array(
            [np.sin(2 * np.pi * f / 60.0), np.cos(2 * np.pi * f / 90.0)]
        )
        dets, fids = [], []
        for i in range(n_obj):
            p = pos[i] + vel[i] * f + pan
            if not (-20 < p[0] < 620 and -20 < p[1] < 460):
                continue
            if rng.uniform() < drop_p:
                continue
            x1, y1 = p + rng.normal(0, 1.5, 2)
            w, h = size[i] * rng.uniform(0.95, 1.05, 2)
            conf = (
                rng.uniform(0.15, 0.44)
                if rng.uniform() < low_conf_p
                else rng.uniform(0.5, 0.98)
            )
            dets.append([x1, y1, x1 + w, y1 + h, conf, 0.0])
            fids.append(i)
        if rng.uniform() < clutter_p:
            x1, y1 = rng.uniform(0, 560, 2)
            dets.append([x1, y1, x1 + 40, y1 + 60, rng.uniform(0.5, 0.9), 0.0])
            fids.append(next_clutter)
            next_clutter += 1
        frames.append(np.asarray(dets, np.float32).reshape(-1, 6))
        ids.append(np.asarray(fids, np.int64))
    return frames, ids


def mot17_mini_frames(seq_idx):
    from boxmot_tpu.data.mot import MOTDataset
    from pathlib import Path

    fixture = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"
    ds = MOTDataset(fixture)
    seq = ds.sequences[seq_idx]
    return seq.dets_per_frame(), (seq.info.im_height, seq.info.im_width)


def identity_embs(ids, dim=512, noise=0.03, seed=7):
    """Deterministic near-unit embeddings per ground-truth identity."""
    rng = np.random.default_rng(seed)
    bases = {}
    out = []
    for frame_ids in ids:
        embs = np.zeros((len(frame_ids), dim), np.float32)
        for r, i in enumerate(frame_ids):
            if i not in bases:
                b = np.random.default_rng(seed + 1000 + int(i)).normal(size=dim)
                bases[i] = b / np.linalg.norm(b)
            e = bases[i] + noise * rng.normal(size=dim)
            embs[r] = (e / np.linalg.norm(e)).astype(np.float32)
        out.append(embs)
    return out


def box_masks(frames, hw=(480, 640)):
    """Synthetic instance masks: the filled det box (for sam2mot)."""
    H, W = hw
    out = []
    for dets in frames:
        m = np.zeros((len(dets), H, W), bool)
        for r, d in enumerate(dets):
            x1, y1, x2, y2 = [int(np.clip(v, 0, lim)) for v, lim in
                              zip(d[:4], (W - 1, H - 1, W - 1, H - 1))]
            m[r, y1:y2 + 1, x1:x2 + 1] = True
        out.append(m)
    return out


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------


def run_ref(tracker, frames, img=IMG, embs=None, masks=None):
    outs = []
    for f, dets in enumerate(frames):
        kw = {}
        if embs is not None:
            kw["embs"] = embs[f]
        if masks is not None:
            kw["masks"] = masks[f]
        outs.append(np.asarray(tracker.update(dets, img, **kw), np.float64))
    return outs


def run_repo(tracker, frames, img=IMG, embs=None, masks=None):
    outs = []
    for f, dets in enumerate(frames):
        kw = {}
        if embs is not None:
            kw["embs"] = embs[f]
        if masks is not None:
            kw["masks"] = masks[f]
        outs.append(np.asarray(tracker.update(dets, img, **kw), np.float64))
    return outs


def compare_tracks(ref_outs, repo_outs, tol_px=5e-2, tol_conf=1e-3,
                   check_ids=True):
    """Row-level parity: same det_ind sets per frame, boxes within tol, and
    a single consistent ID bijection across the whole sequence."""
    assert len(ref_outs) == len(repo_outs)
    fwd, rev = {}, {}
    for f, (a, b) in enumerate(zip(ref_outs, repo_outs)):
        a = np.asarray(a, np.float64).reshape(-1, 8)
        b = np.asarray(b, np.float64).reshape(-1, 8)
        da = {int(round(r[7])): r for r in a}
        db = {int(round(r[7])): r for r in b}
        assert set(da) == set(db), (
            f"frame {f}: reported det_ind sets differ\n"
            f"  ref={sorted(da)}\n  repo={sorted(db)}"
        )
        for k in sorted(da):
            ra, rb = da[k], db[k]
            np.testing.assert_allclose(
                rb[:4], ra[:4], atol=tol_px, rtol=0,
                err_msg=f"frame {f} det_ind {k}: box mismatch",
            )
            assert abs(ra[5] - rb[5]) <= tol_conf, (
                f"frame {f} det_ind {k}: conf {ra[5]} vs {rb[5]}"
            )
            assert int(round(ra[6])) == int(round(rb[6])), (
                f"frame {f} det_ind {k}: cls {ra[6]} vs {rb[6]}"
            )
            if check_ids:
                ia, ib = int(round(ra[4])), int(round(rb[4]))
                if ia in fwd:
                    assert fwd[ia] == ib, (
                        f"frame {f} det_ind {k}: ref id {ia} previously mapped "
                        f"to repo id {fwd[ia]}, now {ib}"
                    )
                if ib in rev:
                    assert rev[ib] == ia, (
                        f"frame {f} det_ind {k}: repo id {ib} previously mapped "
                        f"to ref id {rev[ib]}, now {ia}"
                    )
                fwd[ia] = ib
                rev[ib] = ia
    return fwd


# ---------------------------------------------------------------------------
# scene fixtures (built once per session)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
def scene_long():
    return moving_scene(n_frames=300, n_obj=8, seed=0)


@pytest.fixture(scope="session")
def scene_occl():
    return moving_scene(n_frames=120, n_obj=6, seed=3, occlusion=True)


@pytest.fixture(scope="session")
def scene_pan():
    return moving_scene(n_frames=150, n_obj=6, seed=5, pan_amp=12.0, drop_p=0.2)


SCENES = ["long", "occl", "pan"]
SLOW = pytest.mark.slow
# Deep (appearance) parity runs are minutes each; the default suite keeps
# one flagship sentinel (OccluBoost occl) and defers the rest to -m slow.
DEEP_SCENES = [pytest.param("long", marks=SLOW), pytest.param("occl", marks=SLOW)]
DEEP_SCENES_ALL = DEEP_SCENES + [pytest.param("pan", marks=SLOW)]


def get_scene(name, scene_long, scene_occl, scene_pan):
    return {"long": scene_long, "occl": scene_occl, "pan": scene_pan}[name]


def _pair(name, **kw):
    """(reference tracker, repo tracker) built with identical params."""
    import boxmot.trackers as RT
    import boxmot_tpu.trackers as TT

    ref_cls = getattr(RT, name)
    repo_cls = getattr(TT, name)
    return ref_cls(**kw), repo_cls(**kw)


# ---------------------------------------------------------------------------
# motion-only trackers
# ---------------------------------------------------------------------------


class TestByteTrack:
    @pytest.mark.parametrize("scene", SCENES)
    def test_synthetic(self, scene, scene_long, scene_occl, scene_pan):
        frames, _ = get_scene(scene, scene_long, scene_occl, scene_pan)
        ref, repo = _pair("ByteTrack")
        compare_tracks(run_ref(ref, frames), run_repo(repo, frames))

    @pytest.mark.parametrize("seq_idx", [0, 1])
    def test_mot17_mini(self, seq_idx):
        frames, hw = mot17_mini_frames(seq_idx)
        img = np.zeros((*hw, 3), np.uint8)
        ref, repo = _pair("ByteTrack")
        compare_tracks(run_ref(ref, frames, img), run_repo(repo, frames, img))


class TestOcSort:
    @pytest.mark.parametrize("scene", SCENES)
    def test_synthetic(self, scene, scene_long, scene_occl, scene_pan):
        frames, _ = get_scene(scene, scene_long, scene_occl, scene_pan)
        ref, repo = _pair("OcSort")
        compare_tracks(run_ref(ref, frames), run_repo(repo, frames))

    def test_use_byte(self, scene_occl):
        frames, _ = scene_occl
        ref, repo = _pair("OcSort", use_byte=True)
        compare_tracks(run_ref(ref, frames), run_repo(repo, frames))

    @pytest.mark.parametrize("seq_idx", [0, 1])
    def test_mot17_mini(self, seq_idx):
        frames, hw = mot17_mini_frames(seq_idx)
        img = np.zeros((*hw, 3), np.uint8)
        ref, repo = _pair("OcSort")
        compare_tracks(run_ref(ref, frames, img), run_repo(repo, frames, img))


class _DummyReID:
    """Placeholder reid_model: trackers must never call it when embs are
    passed explicitly (both sides gate on `embs is not None`)."""

    def get_features(self, *a, **k):  # pragma: no cover
        raise AssertionError("reid model must not be consulted when embs given")


class TestBotSort:
    @pytest.mark.parametrize("scene", SCENES)
    def test_motion_only(self, scene, scene_long, scene_occl, scene_pan):
        frames, _ = get_scene(scene, scene_long, scene_occl, scene_pan)
        ref, repo = _pair("BotSort", with_reid=False)
        compare_tracks(run_ref(ref, frames), run_repo(repo, frames))

    @pytest.mark.parametrize("scene", DEEP_SCENES)
    def test_with_reid(self, scene, scene_long, scene_occl, scene_pan):
        frames, ids = get_scene(scene, scene_long, scene_occl, scene_pan)
        embs = identity_embs(ids)
        ref, repo = _pair("BotSort", with_reid=True, reid_model=_DummyReID())
        compare_tracks(
            run_ref(ref, frames, embs=embs), run_repo(repo, frames, embs=embs)
        )

    @pytest.mark.parametrize("seq_idx", [0, 1])
    def test_mot17_mini(self, seq_idx):
        frames, hw = mot17_mini_frames(seq_idx)
        img = np.zeros((*hw, 3), np.uint8)
        ref, repo = _pair("BotSort", with_reid=False)
        compare_tracks(run_ref(ref, frames, img), run_repo(repo, frames, img))


class TestDeepOcSort:
    @pytest.mark.parametrize("scene", SCENES)
    def test_motion_only(self, scene, scene_long, scene_occl, scene_pan):
        frames, _ = get_scene(scene, scene_long, scene_occl, scene_pan)
        ref, repo = _pair("DeepOcSort", embedding_off=True, cmc_off=True)
        compare_tracks(run_ref(ref, frames), run_repo(repo, frames))

    @pytest.mark.parametrize("scene", DEEP_SCENES)
    def test_with_embs(self, scene, scene_long, scene_occl, scene_pan):
        frames, ids = get_scene(scene, scene_long, scene_occl, scene_pan)
        embs = identity_embs(ids)
        ref, repo = _pair("DeepOcSort")
        compare_tracks(
            run_ref(ref, frames, embs=embs), run_repo(repo, frames, embs=embs)
        )


class TestStrongSort:
    @pytest.mark.parametrize("scene", DEEP_SCENES_ALL)
    def test_with_embs(self, scene, scene_long, scene_occl, scene_pan):
        frames, ids = get_scene(scene, scene_long, scene_occl, scene_pan)
        embs = identity_embs(ids)
        ref, repo = _pair("StrongSort")
        compare_tracks(
            run_ref(ref, frames, embs=embs), run_repo(repo, frames, embs=embs)
        )


class TestBoostTrack:
    @pytest.mark.parametrize("scene", SCENES)
    def test_motion_only(self, scene, scene_long, scene_occl, scene_pan):
        frames, _ = get_scene(scene, scene_long, scene_occl, scene_pan)
        ref, repo = _pair("BoostTrack")
        compare_tracks(run_ref(ref, frames), run_repo(repo, frames))

    @pytest.mark.parametrize("scene", DEEP_SCENES)
    def test_with_reid(self, scene, scene_long, scene_occl, scene_pan):
        frames, ids = get_scene(scene, scene_long, scene_occl, scene_pan)
        embs = identity_embs(ids)
        ref, repo = _pair("BoostTrack", with_reid=True, reid_model=_DummyReID())
        compare_tracks(
            run_ref(ref, frames, embs=embs), run_repo(repo, frames, embs=embs)
        )

    @SLOW
    def test_plusplus(self, scene_occl):
        """BoostTrack++: rich shape similarity, soft-BIoU, visual cues."""
        frames, ids = scene_occl
        embs = identity_embs(ids)
        kw = dict(
            with_reid=True, use_rich_s=True, use_sb=True, use_vt=True,
            reid_model=_DummyReID(),
        )
        ref, repo = _pair("BoostTrack", **kw)
        compare_tracks(
            run_ref(ref, frames, embs=embs), run_repo(repo, frames, embs=embs)
        )


class TestOccluBoost:
    @pytest.mark.parametrize(
        "scene",
        [pytest.param("long", marks=SLOW), "occl", pytest.param("pan", marks=SLOW)],
    )
    def test_with_reid(self, scene, scene_long, scene_occl, scene_pan):
        frames, ids = get_scene(scene, scene_long, scene_occl, scene_pan)
        embs = identity_embs(ids)
        ref, repo = _pair("OccluBoost", with_reid=True, reid_model=_DummyReID())
        compare_tracks(
            run_ref(ref, frames, embs=embs), run_repo(repo, frames, embs=embs)
        )

    @SLOW
    def test_second_pass(self, scene_occl):
        frames, ids = scene_occl
        embs = identity_embs(ids)
        kw = dict(with_reid=True, use_second_pass=True, reid_model=_DummyReID())
        ref, repo = _pair("OccluBoost", **kw)
        compare_tracks(
            run_ref(ref, frames, embs=embs), run_repo(repo, frames, embs=embs)
        )


class TestHybridSort:
    @pytest.mark.parametrize("scene", SCENES)
    def test_motion_only(self, scene, scene_long, scene_occl, scene_pan):
        frames, _ = get_scene(scene, scene_long, scene_occl, scene_pan)
        ref, repo = _pair("HybridSort", with_reid=False)
        compare_tracks(run_ref(ref, frames), run_repo(repo, frames))

    @pytest.mark.parametrize("scene", DEEP_SCENES)
    def test_with_embs(self, scene, scene_long, scene_occl, scene_pan):
        frames, ids = get_scene(scene, scene_long, scene_occl, scene_pan)
        embs = identity_embs(ids)
        ref, repo = _pair("HybridSort", with_reid=True)
        compare_tracks(
            run_ref(ref, frames, embs=embs), run_repo(repo, frames, embs=embs)
        )


class TestSam2Mot:
    def test_with_masks(self, scene_occl):
        frames, _ = scene_occl
        masks = box_masks(frames)
        ref, repo = _pair("Sam2Mot")
        compare_tracks(
            run_ref(ref, frames, masks=masks), run_repo(repo, frames, masks=masks)
        )


class TestSFSORT:
    @pytest.mark.parametrize("scene", SCENES)
    def test_synthetic(self, scene, scene_long, scene_occl, scene_pan):
        frames, _ = get_scene(scene, scene_long, scene_occl, scene_pan)
        ref, repo = _pair("SFSORT")
        compare_tracks(run_ref(ref, frames), run_repo(repo, frames))

    @pytest.mark.parametrize("seq_idx", [0, 1])
    def test_mot17_mini(self, seq_idx):
        frames, hw = mot17_mini_frames(seq_idx)
        img = np.zeros((*hw, 3), np.uint8)
        ref, repo = _pair("SFSORT")
        compare_tracks(run_ref(ref, frames, img), run_repo(repo, frames, img))
