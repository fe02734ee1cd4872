"""HOTA/CLEAR/Identity metric implementation tests with analytic cases."""

import numpy as np

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
