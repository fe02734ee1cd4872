"""HOTA/CLEAR/Identity metric implementation tests with analytic cases."""

import numpy as np
import pytest

from boxmot_tpu.engine.metrics.mot_metrics import (
    SeqEvalData,
    clear_finalize,
    clear_metrics,
    evaluate_sequences,
    hota_finalize,
    hota_metrics,
    identity_finalize,
    identity_metrics,
    preprocess_sequence,
)


def mot_rows(entries):
    """entries: list of (frame, id, l, t, w, h)."""
    return np.array(
        [[f, i, l, t, w, h, 1.0, 1, 1.0] for f, i, l, t, w, h in entries], float
    )


def make_data(gt_entries, trk_entries, seq_len):
    return preprocess_sequence(
        mot_rows(gt_entries), mot_rows(trk_entries), seq_len, do_preproc=False
    )


class TestPerfectTracker:
    def setup_method(self):
        entries = [
            (f, i, 10 + 30 * i + f, 20, 20, 40) for f in range(1, 11) for i in range(3)
        ]
        self.data = make_data(entries, entries, 10)

    def test_clear(self):
        m = clear_finalize(clear_metrics(self.data))
        assert m["MOTA"] == 1.0
        assert m["IDSW"] == 0
        assert m["MOTP"] == 1.0
        assert m["MT"] == 3 and m["ML"] == 0

    def test_identity(self):
        m = identity_finalize(identity_metrics(self.data))
        assert m["IDF1"] == 1.0

    def test_hota(self):
        m = hota_finalize(hota_metrics(self.data))
        np.testing.assert_allclose(m["HOTA"], 1.0, atol=1e-9)
        np.testing.assert_allclose(m["DetA"], 1.0, atol=1e-9)
        np.testing.assert_allclose(m["AssA_mean"], 1.0, atol=1e-9)


class TestMissedDetections:
    def test_half_recall(self):
        # GT on frames 1..10, tracker only on frames 1..5: Re=0.5, no FP.
        gt = [(f, 1, 100, 100, 20, 40) for f in range(1, 11)]
        trk = [(f, 7, 100, 100, 20, 40) for f in range(1, 6)]
        data = make_data(gt, trk, 10)
        m = clear_finalize(clear_metrics(data))
        assert m["CLR_TP"] == 5 and m["CLR_FN"] == 5 and m["CLR_FP"] == 0
        assert m["MOTA"] == 0.5
        mi = identity_finalize(identity_metrics(data))
        # IDTP=5, IDFN=5, IDFP=0 -> IDF1 = 5/7.5
        np.testing.assert_allclose(mi["IDF1"], 5 / 7.5)
        mh = hota_finalize(hota_metrics(data))
        # DetA = 5/10 at all alphas.  AssA: the single pair has
        # A = TPA/(TPA+FNA+FPA) = 5/(10+5-5) = 0.5 — the gt's unmatched
        # frames count as FNA per the HOTA definition.
        np.testing.assert_allclose(mh["DetA"], 0.5, atol=1e-9)
        np.testing.assert_allclose(mh["AssA_mean"], 0.5, atol=1e-9)
        np.testing.assert_allclose(mh["HOTA"], 0.5, atol=1e-9)


class TestIdSwitch:
    def test_single_switch(self):
        # One GT object tracked 10 frames; tracker id changes at frame 6.
        gt = [(f, 1, 100, 100, 20, 40) for f in range(1, 11)]
        trk = [(f, 1 if f <= 5 else 2, 100, 100, 20, 40) for f in range(1, 11)]
        data = make_data(gt, trk, 10)
        m = clear_finalize(clear_metrics(data))
        assert m["IDSW"] == 1
        np.testing.assert_allclose(m["MOTA"], 1 - 1 / 10)
        mi = identity_finalize(identity_metrics(data))
        # Best global match keeps id with 5 overlap: IDTP=5, IDFN=5, IDFP=5.
        np.testing.assert_allclose(mi["IDF1"], 5 / (5 + 0.5 * 5 + 0.5 * 5))
        mh = hota_finalize(hota_metrics(data))
        # DetA = 1. AssA: each TP's pair has A = 5/(10+5-5) = 0.5.
        np.testing.assert_allclose(mh["DetA"], 1.0, atol=1e-9)
        np.testing.assert_allclose(mh["AssA_mean"], 0.5, atol=1e-9)
        np.testing.assert_allclose(mh["HOTA"], np.sqrt(0.5), atol=1e-9)


class TestFalsePositives:
    def test_pure_fp(self):
        gt = [(f, 1, 100, 100, 20, 40) for f in range(1, 6)]
        trk = [(f, 1, 100, 100, 20, 40) for f in range(1, 6)] + [
            (f, 9, 500, 300, 20, 40) for f in range(1, 6)
        ]
        data = make_data(gt, trk, 5)
        m = clear_finalize(clear_metrics(data))
        assert m["CLR_FP"] == 5 and m["CLR_TP"] == 5
        assert m["MOTA"] == 0.0


class TestPreprocessing:
    def test_distractor_removal(self):
        # GT has a distractor-class (8) box; tracker dets on it are removed,
        # not counted as FP.
        gt = np.array(
            [
                [1, 1, 100, 100, 20, 40, 1, 1, 1.0],  # pedestrian
                [1, 2, 300, 100, 20, 40, 1, 8, 1.0],  # distractor
            ],
            float,
        )
        trk = mot_rows([(1, 1, 100, 100, 20, 40), (1, 2, 300, 100, 20, 40)])
        data = preprocess_sequence(gt, trk, 1, do_preproc=True)
        m = clear_finalize(clear_metrics(data))
        assert m["CLR_TP"] == 1 and m["CLR_FP"] == 0 and m["CLR_FN"] == 0

    def test_zero_marked_gt_removed(self):
        gt = np.array(
            [
                [1, 1, 100, 100, 20, 40, 0, 1, 1.0],  # consider = 0
            ],
            float,
        )
        trk = np.zeros((0, 9))
        data = preprocess_sequence(gt, trk, 1)
        assert data.num_gt_dets == 0

    def test_non_pedestrian_gt_removed(self):
        gt = np.array([[1, 1, 100, 100, 20, 40, 1, 3, 1.0]], float)  # class 3 = car
        trk = np.zeros((0, 9))
        data = preprocess_sequence(gt, trk, 1)
        assert data.num_gt_dets == 0


def test_multi_sequence_combination():
    gt = [(f, 1, 100, 100, 20, 40) for f in range(1, 11)]
    perfect = make_data(gt, gt, 10)
    half = make_data(gt, [(f, 7, 100, 100, 20, 40) for f in range(1, 6)], 10)
    res = evaluate_sequences({"a": perfect, "b": half})
    c = res["combined"]
    # combined: TP=15, FN=5, FP=0 -> MOTA = 1 - 5/20
    np.testing.assert_allclose(c["MOTA"], 0.75)
    assert set(res["per_seq"]) == {"a", "b"}
    np.testing.assert_allclose(res["per_seq"]["a"]["HOTA"], 1.0, atol=1e-9)


class TestOBBEvaluation:
    @staticmethod
    def _rows(id_offset=10, frames=8):
        from boxmot_tpu.engine.metrics.mot_metrics import obb_to_corners

        gt_rows, trk_rows = [], []
        for f in range(1, frames + 1):
            boxes = np.array(
                [
                    [100 + 5 * f, 100, 60, 24, 0.1 + 0.02 * f],
                    [300 - 5 * f, 150, 40, 80, -0.3],
                ],
                np.float32,
            )
            corners = obb_to_corners(boxes)
            for i, tid in enumerate((1, 2)):
                gt_rows.append([f, tid, *corners[i], 1.0, 1])
                trk_rows.append([f, tid + id_offset, *corners[i], 0.9, 1])
        return np.array(gt_rows), np.array(trk_rows)

    def test_perfect_tracking(self):
        from boxmot_tpu.engine.metrics.mot_metrics import (
            evaluate_sequences,
            preprocess_sequence_obb,
        )

        gt, trk = self._rows()
        data = preprocess_sequence_obb(gt, trk, 8)
        c = evaluate_sequences({"s": data})["combined"]
        assert c["HOTA"] == pytest.approx(1.0)
        assert c["MOTA"] == pytest.approx(1.0)
        assert c["IDF1"] == pytest.approx(1.0)

    def test_id_switch_penalized(self):
        from boxmot_tpu.engine.metrics.mot_metrics import (
            evaluate_sequences,
            preprocess_sequence_obb,
        )

        gt, trk = self._rows()
        mask = (trk[:, 0] > 4) & (trk[:, 1] == 11)
        trk[mask, 1] = 13
        c = evaluate_sequences({"s": preprocess_sequence_obb(gt, trk, 8)})["combined"]
        assert c["IDSW"] == 1
        assert c["IDF1"] == pytest.approx(0.75)
        assert c["HOTA"] == pytest.approx(np.sqrt(0.75), abs=1e-3)

    def test_rotated_similarity_semantics(self):
        from boxmot_tpu.engine.metrics.mot_metrics import (
            _rotated_iou_polys,
            obb_to_corners,
        )

        a = obb_to_corners(np.array([[100, 100, 60, 24, 0.4]]))
        # same rect in the flipped parameterization -> IoU 1
        b = obb_to_corners(np.array([[100, 100, 24, 60, 0.4 + np.pi / 2]]))
        sim = _rotated_iou_polys(a, b)
        assert sim[0, 0] == pytest.approx(1.0, abs=1e-3)
        # 90-degree cross of a non-square rect -> well below 1
        c = obb_to_corners(np.array([[100, 100, 60, 24, 0.4 + np.pi / 2]]))
        assert _rotated_iou_polys(a, c)[0, 0] < 0.5

    def test_class_filter(self):
        from boxmot_tpu.engine.metrics.mot_metrics import (
            evaluate_sequences,
            preprocess_sequence_obb,
        )

        gt, trk = self._rows()
        trk[:, 11] = 2  # wrong class for every tracker det
        c = evaluate_sequences({"s": preprocess_sequence_obb(gt, trk, 8, cls_id=1)})[
            "combined"
        ]
        assert c["HOTA"] == pytest.approx(0.0)


def test_evaluate_obb_results_offline(tmp_path):
    from boxmot_tpu.engine.metrics.mot_metrics import (
        evaluate_obb_results,
        obb_to_corners,
    )

    (gt := tmp_path / "gt").mkdir()
    (res := tmp_path / "res").mkdir()
    rows_g, rows_t = [], []
    for f in range(1, 9):
        boxes = np.array(
            [[100 + 5 * f, 100, 60, 24, 0.2], [300, 200, 40, 80, -0.4]], np.float32
        )
        c = obb_to_corners(boxes)
        for i, tid in enumerate((1, 2)):
            rows_g.append([f, tid, *c[i], 1.0, 1])
            rows_t.append([f, tid + 5, *c[i], 0.9, 1])
    np.savetxt(gt / "SEQ-01.txt", np.array(rows_g), delimiter=",")
    np.savetxt(res / "SEQ-01.txt", np.array(rows_t), delimiter=",")
    r = evaluate_obb_results(gt, res)
    assert r["combined"]["HOTA"] == pytest.approx(1.0)
    # a gt sequence with no results file contributes misses, not a crash
    np.savetxt(gt / "SEQ-02.txt", np.array(rows_g), delimiter=",")
    r2 = evaluate_obb_results(gt, res)
    assert r2["combined"]["HOTA"] == pytest.approx(np.sqrt(0.5), abs=1e-3)
