"""OC-SORT SoA step: contract tests + scenario parity vs the numpy oracle."""

import numpy as np
import pytest

from boxmot_tpu.trackers.ocsort import OcSort
from tests.oracle.ocsort_np import OcSortOracle
from tests.test_tracker_bytetrack import moving_scene

IMG = np.zeros((480, 640, 3), np.uint8)


def run_pair(frames, **kw):
    trk = OcSort(**kw)
    orc = OcSortOracle(
        det_thresh=kw.get("det_thresh", 0.3),
        min_hits=kw.get("min_hits", 3),
        max_age=kw.get("max_age", 30),
        iou_threshold=kw.get("iou_threshold", 0.3),
    )
    outs_t, outs_o = [], []
    for dets in frames:
        outs_t.append(np.asarray(trk.update(dets, IMG)))
        outs_o.append(orc.update(dets))
    return outs_t, outs_o


def by_id(rows):
    return {int(r[4]): r for r in rows}


class TestContract:
    def test_shape_and_warmup_emission(self):
        trk = OcSort()
        dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        out = trk.update(dets, IMG)
        assert out.shape == (1, 8)  # frame 1 <= min_hits: emitted
        assert int(out.id[0]) == 1

    def test_min_hits_gate(self):
        trk = OcSort(min_hits=2)
        d1 = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        trk.update(d1, IMG)  # frame 1 (warmup)
        trk.update(d1, IMG)  # frame 2 (warmup)
        # new object appears at frame 3: needs streak >= 2
        d2 = np.vstack([d1, [[300, 300, 350, 380, 0.9, 0.0]]]).astype(np.float32)
        out3 = trk.update(d2, IMG)
        assert set(out3.id.astype(int)) == {1}
        out4 = trk.update(d2, IMG)  # streak 1 < min_hits
        assert set(out4.id.astype(int)) == {1}
        out5 = trk.update(d2, IMG)  # streak 2 >= min_hits
        assert set(out5.id.astype(int)) == {1, 2}

    def test_no_dets(self):
        trk = OcSort()
        out = trk.update(np.empty((0, 6), np.float32), IMG)
        assert out.shape[0] == 0

    def test_outputs_observation_box(self):
        # OC-SORT emits the raw detection box for observed tracks.
        trk = OcSort()
        dets = np.array([[10.5, 10.5, 60.5, 100.5, 0.9, 0.0]], np.float32)
        out = trk.update(dets, IMG)
        np.testing.assert_allclose(np.asarray(out)[0, :4], dets[0, :4], atol=1e-4)

    def test_max_age_removal(self):
        trk = OcSort(max_age=2, min_hits=1)
        dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        for _ in range(3):
            trk.update(dets, IMG)
        for _ in range(4):
            trk.update(np.empty((0, 6), np.float32), IMG)
        out = trk.update(dets, IMG)  # must be a new id
        out = trk.update(dets, IMG)
        assert int(out.id[0]) != 1


class TestOracleParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_synthetic_scene_parity(self, seed):
        frames = moving_scene(n_frames=40, seed=seed, low_conf_p=0.0)
        outs_t, outs_o = run_pair(frames)
        mismatch = 0
        for f, (rt, ro) in enumerate(zip(outs_t, outs_o)):
            dt, do = by_id(rt), by_id(ro)
            if set(dt) != set(do):
                mismatch += 1
                continue
            for tid, row in dt.items():
                np.testing.assert_allclose(row[:4], do[tid][:4], atol=0.6, rtol=1e-3)
        assert mismatch <= 1, f"{mismatch} mismatching frames"

    def test_occlusion_oru_parity(self):
        """Object disappears for 4 frames and returns — exercises OCR + ORU."""
        frames = []
        for f in range(25):
            rows = [[50 + 6 * f, 100, 110 + 6 * f, 220, 0.9, 0.0]]
            if 10 <= f < 14:
                rows = []
            frames.append(np.array(rows, np.float32).reshape(-1, 6))
        outs_t, outs_o = run_pair(frames, min_hits=1)
        for f, (rt, ro) in enumerate(zip(outs_t, outs_o)):
            assert set(by_id(rt)) == set(by_id(ro)), f"frame {f}"
            for tid, row in by_id(rt).items():
                np.testing.assert_allclose(
                    row[:4], by_id(ro)[tid][:4], atol=0.6, rtol=1e-3
                )
        # identity preserved across the occlusion in both
        ids_before = set(by_id(outs_t[9]))
        ids_after = set(by_id(outs_t[16]))
        assert ids_before == ids_after == {1}

    def test_crossing_parity(self):
        frames = []
        for f in range(30):
            a = [50 + 8 * f, 100, 110 + 8 * f, 220, 0.9, 0.0]
            b = [290 - 8 * f, 105, 350 - 8 * f, 225, 0.85, 0.0]
            frames.append(np.array([a, b], np.float32))
        outs_t, outs_o = run_pair(frames)
        agree = sum(
            set(by_id(rt)) == set(by_id(ro)) for rt, ro in zip(outs_t, outs_o)
        )
        assert agree >= len(frames) - 1


def test_centroid_asso_uses_first_frame_size():
    """asso_func='centroid' needs the frame w/h, captured from the first
    update's img (reference basetracker.py:177-181).  Regression: the
    config used to reach the step without frame dims and raise."""
    from boxmot_tpu.trackers.ocsort import OcSort

    trk = OcSort(asso_func="centroid", min_hits=1, det_thresh=0.5)
    img = np.zeros((480, 640, 3), np.uint8)
    out = None
    for f in range(5):
        d = np.array([[50 + 4 * f, 60, 110 + 4 * f, 180, 0.9, 0]], np.float32)
        out = np.asarray(trk.update(d, img))
    assert trk.cfg.frame_w == 640.0 and trk.cfg.frame_h == 480.0
    assert len(out) == 1  # track held together by centroid distance


def test_centroid_asso_obb_frame_size():
    from boxmot_tpu.trackers.ocsort import OcSort

    trk = OcSort(asso_func="centroid", min_hits=1, det_thresh=0.5,
                 asso_threshold=0.9)
    img = np.zeros((512, 512, 3), np.uint8)
    out = None
    for f in range(5):
        d = np.array([[100 + 3 * f, 120, 40, 20, 0.2, 0.9, 0]], np.float32)
        out = np.asarray(trk.update(d, img))
    assert len(out) == 1 and out.shape[1] == 9
