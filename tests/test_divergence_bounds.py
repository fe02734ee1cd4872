"""Metric bounds for the documented reference divergences.

The generic differential scenes in test_reference_parity.py pass
ID-for-ID, which shows the documented divergences (occluboost.py:21-25,
ops/lap.py near-tie behavior) never fire there.  These tests instead
construct scenes ENGINEERED to trigger each divergence — exactly
tied association costs, more than MAX_RES_PER_FRAME simultaneous
graveyard resurrections, more than GRAVE_SLOTS deaths between a track's
disappearance and return — and pin the resulting metric impact against
the actual reference implementation (via the tests/refshim lap shim).

This converts "rare, should not matter" docstring claims into measured
HOTA/IDF1/MOTA deltas that fail loudly if a change widens them.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.refshim import reference_available
from tests.test_reference_parity import (
    IMG,
    _DummyReID,
    _pair,
    run_ref,
    run_repo,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

from boxmot_tpu.engine.metrics.mot_metrics import (  # noqa: E402
    evaluate_sequences,
    preprocess_sequence,
)
from boxmot_tpu.engine.mot_io import convert_to_mot_format  # noqa: E402


def metrics_vs_gt(outs, gt_rows, n_frames):
    """HOTA/MOTA/IDF1 of per-frame tracker outputs against scene GT."""
    rows = [
        convert_to_mot_format(np.asarray(o), f + 1)
        for f, o in enumerate(outs)
        if len(o)
    ]
    trk = (
        np.concatenate(rows).astype(np.float64)
        if rows
        else np.zeros((0, 9), np.float64)
    )
    entry = preprocess_sequence(np.asarray(gt_rows, np.float64), trk, n_frames)
    c = evaluate_sequences({"seq": entry})["combined"]
    return {k: float(c[k]) for k in ("HOTA", "MOTA", "IDF1")}


def gt_row(frame, tid, box):
    x1, y1, x2, y2 = box[:4]
    return [frame, tid + 1, x1, y1, x2 - x1, y2 - y1, 1, 1, 1.0]


def delta(a, b):
    return {k: abs(a[k] - b[k]) for k in a}


# ---------------------------------------------------------------------------
# 1. Auction-solver near ties (ops/lap.py): exactly tied costs
# ---------------------------------------------------------------------------


def tied_cost_scene(n_frames=120, n_pairs=4):
    """Pairs of identical-size objects whose boxes coincide exactly for a
    10-frame stretch mid-sequence, then separate.  During the merge the
    two assignment permutations have EXACTLY equal cost, so any solver's
    tie-break decides which track follows which object afterwards."""
    frames, gt = [], []
    size = np.array([48.0, 80.0])
    for f in range(n_frames):
        dets = []
        for p in range(n_pairs):
            cy = 60.0 + 110.0 * p
            # objects approach, coincide on frames 50-59, then separate
            if f < 50:
                off = 40.0 * (1.0 - f / 50.0)
            elif f < 60:
                off = 0.0
            else:
                off = 40.0 * ((f - 59) / 50.0)
            for s, tid in ((-1.0, 2 * p), (1.0, 2 * p + 1)):
                x1 = 250.0 + s * off
                box = [x1, cy, x1 + size[0], cy + size[1]]
                dets.append(box + [0.9, 0.0])
                gt.append(gt_row(f + 1, tid, box))
        frames.append(np.asarray(dets, np.float32))
    return frames, np.asarray(gt, np.float64)


@pytest.mark.parametrize("name", ["ByteTrack", "OcSort", "SFSORT"])
def test_tied_costs_metric_bound(name):
    frames, gt = tied_cost_scene()
    ref, repo = _pair(name)
    m_ref = metrics_vs_gt(run_ref(ref, frames), gt, len(frames))
    m_repo = metrics_vs_gt(run_repo(repo, frames), gt, len(frames))
    d = delta(m_ref, m_repo)
    # coincident boxes make identity unobservable: either tie-break is an
    # equally valid MOT solution, so the bound is on metric impact only
    assert d["HOTA"] <= 0.02, (m_ref, m_repo)
    assert d["MOTA"] <= 0.01, (m_ref, m_repo)  # FN/FP/IDSW budget unchanged
    assert d["IDF1"] <= 0.05, (m_ref, m_repo)


# ---------------------------------------------------------------------------
# 2. OccluBoost MAX_RES_PER_FRAME=8: 12 simultaneous resurrections
# ---------------------------------------------------------------------------


def mass_occlusion_scene(n_obj=12, n_frames=90, gap=(40, 52)):
    """n_obj objects visible throughout GT but undetected during the gap
    (mass occlusion); all reappear on the SAME frame.  With max_age below
    the gap length every track dies to the graveyard, so the return frame
    asks for n_obj > MAX_RES_PER_FRAME simultaneous resurrections with
    gap interpolation."""
    rng = np.random.default_rng(11)
    pos = np.stack(
        [rng.uniform(40, 560, n_obj), rng.uniform(40, 340, n_obj)], axis=1
    )
    vel = rng.uniform(-1.5, 1.5, (n_obj, 2))
    size = rng.uniform(35, 70, (n_obj, 2))
    frames, gt, ids = [], [], []
    for f in range(n_frames):
        dets, fids = [], []
        for i in range(n_obj):
            p = pos[i] + vel[i] * f
            box = [p[0], p[1], p[0] + size[i, 0], p[1] + size[i, 1]]
            gt.append(gt_row(f + 1, i, box))
            if gap[0] <= f < gap[1]:
                continue  # occluded: no detection, GT still present
            dets.append(box + [0.9, 0.0])
            fids.append(i)
        frames.append(np.asarray(dets, np.float32).reshape(-1, 6))
        ids.append(np.asarray(fids, np.int64))
    return frames, np.asarray(gt, np.float64), ids


def scene_embs(ids, n_obj, dim=512):
    bases = np.random.default_rng(5).normal(size=(n_obj + 1, dim))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    return [np.asarray(bases[fids], np.float32).reshape(-1, dim) for fids in ids]


def metrics_with_gap_rows(outs, tracker, gt_rows, n_frames):
    """Like metrics_vs_gt but appends the tracker's flush_gta gap-fill
    rows (the GTA interpolation through the occlusion)."""
    rows = [
        convert_to_mot_format(np.asarray(o), f + 1)
        for f, o in enumerate(outs)
        if len(o)
    ]
    gap = np.asarray(tracker.flush_gta(), np.float64).reshape(-1, 9)
    rows.append(gap)
    trk = np.concatenate(rows).astype(np.float64)
    entry = preprocess_sequence(np.asarray(gt_rows, np.float64), trk, n_frames)
    c = evaluate_sequences({"seq": entry})["combined"]
    m = {k: float(c[k]) for k in ("HOTA", "MOTA", "IDF1")}
    return m, len(gap)


def test_mass_resurrection_metric_bound():
    frames, gt, ids = mass_occlusion_scene()
    embs = scene_embs(ids, 12)
    kw = dict(with_reid=True, reid_model=_DummyReID(), max_age=8,
              use_cmc=False)
    ref, repo = _pair("OccluBoost", **kw)
    out_ref = run_ref(ref, frames, embs=embs)
    out_repo = run_repo(repo, frames, embs=embs)
    # the per-frame emissions must actually revive graveyard ids — the
    # scene is only a divergence probe if > MAX_RES_PER_FRAME (8) ids
    # come back simultaneously
    pre = set(int(r[4]) for o in out_repo[:40] for r in np.asarray(o).reshape(-1, 8))
    ret = set(int(r[4]) for r in np.asarray(out_repo[55]).reshape(-1, 8))
    assert len(pre & ret) > 8, "scene no longer triggers mass resurrection"
    m_ref, n_gap_ref = metrics_with_gap_rows(out_ref, ref, gt, len(frames))
    m_repo, n_gap_repo = metrics_with_gap_rows(out_repo, repo, gt, len(frames))
    # the repo interpolates at most MAX_RES_PER_FRAME gaps for the shared
    # return frame where the reference fills all of them
    assert n_gap_repo <= n_gap_ref, (n_gap_ref, n_gap_repo)
    d = delta(m_ref, m_repo)
    assert m_repo["IDF1"] >= m_ref["IDF1"] - 0.03, (m_ref, m_repo)
    assert d["HOTA"] <= 0.03, (m_ref, m_repo)
    assert d["MOTA"] <= 0.06, (m_ref, m_repo)


# ---------------------------------------------------------------------------
# 3. OccluBoost GRAVE_SLOTS=64: eviction before a late return
# ---------------------------------------------------------------------------


def graveyard_overflow_scene(n_transient=70, n_frames=200):
    """Object 0 lives frames 1-12 then vanishes; a storm of 70 transient
    objects each live 6 frames and die (filling and overflowing the
    64-slot graveyard); object 0 returns at the end.  The reference's
    unbounded graveyard can revive id 0; the repo's ring has evicted it."""
    size = np.array([50.0, 85.0])
    frames, gt, ids = [], [], []
    box0 = [60.0, 60.0, 60.0 + size[0], 60.0 + size[1]]
    for f in range(n_frames):
        dets, fids = [], []
        present0 = f < 12 or f >= n_frames - 12
        if present0:
            gt.append(gt_row(f + 1, 0, box0))
            dets.append(list(box0) + [0.9, 0.0])
            fids.append(0)
        # two transients alive at any time, staggered 3 frames apart
        for t in range(n_transient):
            start = 14 + 3 * t
            if start <= f < start + 6:
                x = 150.0 + 55.0 * (t % 8)
                y = 150.0 + 60.0 * ((t // 8) % 4)
                box = [x, y, x + 40.0, y + 70.0]
                gt.append(gt_row(f + 1, 1 + t, box))
                dets.append(box + [0.85, 0.0])
                fids.append(1 + t)
        frames.append(np.asarray(dets, np.float32).reshape(-1, 6))
        ids.append(np.asarray(fids, np.int64))
    return frames, np.asarray(gt, np.float64), ids


def test_graveyard_eviction_metric_bound():
    frames, gt, ids = graveyard_overflow_scene()
    embs = scene_embs(ids, 71)
    kw = dict(with_reid=True, reid_model=_DummyReID(), max_age=5,
              use_cmc=False)
    ref, repo = _pair("OccluBoost", **kw)
    m_ref = metrics_vs_gt(run_ref(ref, frames, embs=embs), gt, len(frames))
    m_repo = metrics_vs_gt(run_repo(repo, frames, embs=embs), gt, len(frames))
    d = delta(m_ref, m_repo)
    # worst case is one lost identity bridge out of 71 GT identities
    assert d["HOTA"] <= 0.02, (m_ref, m_repo)
    assert d["IDF1"] <= 0.03, (m_ref, m_repo)
    assert d["MOTA"] <= 0.01, (m_ref, m_repo)


# ---------------------------------------------------------------------------
# MOT17-density full-config bounds (VERDICT r4 #4): a dense scene at the
# tuned YAML tier, both implementations replayed from one shared det/emb
# stream via the full-scale harness machinery.  Budgets pin the measured
# FS-01 residuals (docs/parity.md: 9/10 trackers at 0.00, hybridsort
# -0.18 HOTA from rare min_hits=1 ghost-emission timing) so they cannot
# silently widen.
# ---------------------------------------------------------------------------

DENSITY_BUDGETS_HOTA = {
    # |repo - reference| HOTA budget (fraction, not pp) at MOT17 density
    "bytetrack": 0.002,
    "botsort": 0.002,
    "occluboost": 0.002,
    "hybridsort": 0.002,
}


@pytest.mark.slow
@pytest.mark.parametrize("tracker", sorted(DENSITY_BUDGETS_HOTA))
def test_mot17_density_divergence_bounds(tracker, tmp_path, monkeypatch):
    """200 frames x 50 ids, tuned YAML configs, shared caches."""
    import tools.full_scale_parity as fsp

    monkeypatch.setattr(
        fsp, "SEQUENCES", {"DB-01": (200, 50, 77, 1280, 720)}
    )
    monkeypatch.setattr(fsp, "MASK_SEQ", {})
    box_root, _ = fsp.build_dataset(tmp_path)
    cache = tmp_path / "cache"
    fsp.build_caches(box_root, cache, with_masks=False, names=["DB-01"])
    repo = fsp.run_repo(box_root, cache, tracker, tmp_path / "out" / tracker,
                        ["DB-01"])
    ref = fsp.run_reference(box_root, cache, tracker, ["DB-01"])
    budget = DENSITY_BUDGETS_HOTA[tracker]
    assert abs(repo["HOTA"] - ref["HOTA"]) <= budget, (repo, ref)
