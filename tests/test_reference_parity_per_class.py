"""Differential per-class parity against the actual reference.

The reference's per-class split (trackers/basetracker.py:220-265) loops
classes in ascending order, keeps per-class track lists, and draws ids
from ONE shared creation counter, so ids are globally sequential across
classes.  The repo reproduces that numbering on the host via
``trackers/per_class_ids.GlobalIdAllocator`` over the per-class SoA
states (and native class banks).  These tests assert EXACT id equality
per det_ind — not just a bijection — against the reference, for both
the device and the native ``:cpp`` backends.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.refshim import reference_available
from tests.test_reference_parity import IMG, _pair

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


def reset_reference_id_counters():
    """The reference's id counters are process-global class attributes
    (ByteTrack's BaseTrack._count, BoostTrack/OccluBoost's
    KalmanBoxTracker.count); only OcSort resets its own at init
    (ocsort.py:358).  Exact-id tests compare against fresh-instance
    numbering, so reset them explicitly."""
    from boxmot.trackers.bbox.boosttrack import boosttrack as ref_bt
    from boxmot.trackers.bbox.bytetrack.basetrack import BaseTrack

    BaseTrack.clear_count()
    ref_bt.KalmanBoxTracker.count = 0


def multiclass_scene(n_frames=150, seed=4, n_classes=3):
    """Objects of three classes crossing and dropping out; some boxes of
    different classes overlap exactly, which single-pass tracking would
    merge but per-class tracking must keep apart."""
    rng = np.random.default_rng(seed)
    n_obj = 9
    pos = np.stack([rng.uniform(40, 560, n_obj), rng.uniform(40, 380, n_obj)], 1)
    vel = rng.uniform(-2, 2, (n_obj, 2))
    size = rng.uniform(35, 70, (n_obj, 2))
    cls = np.arange(n_obj) % n_classes
    frames = []
    for f in range(n_frames):
        dets = []
        for i in range(n_obj):
            if (f + 11 * i) % 60 < 3 and f > 5:
                continue  # staggered dropouts
            p = pos[i] + vel[i] * f
            x = 40 + abs((p[0] - 40) % 1000 - 500)
            y = 40 + abs((p[1] - 40) % 640 - 320)
            # 0.37 phase keeps conf off round thresholds (0.5/0.6/0.7):
            # an exactly-0.70 float32 det vs a float64 0.7 gate is a
            # knife-edge, not a divergence worth testing
            conf = 0.703 + 0.25 * np.sin(0.07 * f + i + 0.37)
            dets.append([x, y, x + size[i, 0], y + size[i, 1], conf, float(cls[i])])
        # one exactly-coincident cross-class pair every 30 frames
        if f % 30 == 10 and dets:
            twin = list(dets[0])
            twin[5] = float((int(dets[0][5]) + 1) % n_classes)
            dets.append(twin)
        frames.append(np.asarray(dets, np.float32).reshape(-1, 6))
    return frames


def assert_exact_id_parity(ref_trk, repo_trk, frames, embs=None):
    """det_ind is renumbered within each class slice by both stacks, so
    rows are keyed on (cls, det_ind).  Box tolerance is loose (0.5 px —
    fp32 device KF vs the reference's float64 over bouncing motion);
    the subject under test is EXACT global id equality."""
    for f, dets in enumerate(frames):
        kw = {"embs": embs[f]} if embs is not None else {}
        a = np.asarray(ref_trk.update(dets.copy(), IMG, **kw), np.float64)
        b = np.asarray(repo_trk.update(dets.copy(), IMG, **kw), np.float64)
        a = a.reshape(-1, 8)
        b = b.reshape(-1, 8)
        da = {(int(round(r[6])), int(round(r[7]))): r for r in a}
        db = {(int(round(r[6])), int(round(r[7]))): r for r in b}
        assert len(da) == len(a) and len(db) == len(b)
        assert set(da) == set(db), (
            f"frame {f}: (cls, det_ind) sets differ "
            f"ref={sorted(da)} repo={sorted(db)}"
        )
        for k in sorted(da):
            ra, rb = da[k], db[k]
            np.testing.assert_allclose(
                rb[:4], ra[:4], atol=0.5, rtol=0,
                err_msg=f"frame {f} (cls, det_ind) {k}: box",
            )
            # EXACT global id equality (the reference's shared counter)
            assert int(round(ra[4])) == int(round(rb[4])), (
                f"frame {f} (cls, det_ind) {k}: id {int(ra[4])} vs {int(rb[4])}"
            )


@pytest.mark.parametrize("name", ["ByteTrack", "OcSort"])
def test_per_class_exact_ids_device(name):
    frames = multiclass_scene()
    reset_reference_id_counters()
    ref, repo = _pair(name, per_class=True, nr_classes=3)
    assert_exact_id_parity(ref, repo, frames)


def test_per_class_exact_ids_occluboost_device():
    frames = multiclass_scene(seed=6)
    reset_reference_id_counters()
    ref, repo = _pair(
        "OccluBoost", per_class=True, nr_classes=3, with_reid=False,
        use_cmc=False,
    )
    assert_exact_id_parity(ref, repo, frames)


@pytest.mark.parametrize("spec,ref_name", [
    ("bytetrack:cpp", "ByteTrack"),
    ("ocsort:cpp", "OcSort"),
    ("occluboost:cpp", "OccluBoost"),
])
def test_per_class_exact_ids_native(spec, ref_name):
    import boxmot.trackers as RT

    from boxmot_tpu.trackers.zoo import create_tracker

    frames = multiclass_scene(seed=8)
    kw = dict(per_class=True, nr_classes=3)
    rkw = dict(kw)
    if ref_name == "OccluBoost":
        rkw.update(with_reid=False, use_cmc=False)
    reset_reference_id_counters()
    ref = getattr(RT, ref_name)(**rkw)
    # tracker_config={} bypasses the YAML tier: both sides run on bare
    # constructor defaults (the zoo's YAML tier intentionally differs
    # from constructor defaults, matching the reference's zoo)
    repo = create_tracker(spec, tracker_config={}, **kw)
    assert_exact_id_parity(ref, repo, frames)


def test_per_class_device_vs_native_identical():
    """Both repo backends agree with each other bit-for-bit on ids."""
    from boxmot_tpu.trackers.zoo import create_tracker

    frames = multiclass_scene(seed=12)
    a = create_tracker("bytetrack", per_class=True, nr_classes=3)
    b = create_tracker("bytetrack:cpp", per_class=True, nr_classes=3)
    for f, dets in enumerate(frames):
        oa = np.asarray(a.update(dets.copy(), IMG), np.float64).reshape(-1, 8)
        ob = np.asarray(b.update(dets.copy(), IMG), np.float64).reshape(-1, 8)
        ka = {(int(r[7]), int(r[4])) for r in oa}
        kb = {(int(r[7]), int(r[4])) for r in ob}
        assert ka == kb, f"frame {f}: {sorted(ka)} vs {sorted(kb)}"
