"""KF noise calibration: Q/R estimation from GT + det caches."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.motion.calibration import (
    _cxywh_to_measurement,
    estimate_kf_noise,
    estimate_R_from_detections,
    save_kf_noise,
    tracker_kf_type,
)

FIXTURE = Path(__file__).parent.parent / "assets" / "MOT17-mini" / "train"


def _synthetic_root(tmp_path, noise=2.0, n_frames=40, n_tracks=4, seed=0):
    rng = np.random.default_rng(seed)
    root = tmp_path / "train"
    seq = root / "SEQ-01" / "gt"
    seq.mkdir(parents=True)
    rows = []
    for tid in range(1, n_tracks + 1):
        x0, y0 = rng.uniform(50, 400, 2)
        vx, vy = rng.uniform(-3, 3, 2)
        for f in range(1, n_frames + 1):
            x = x0 + vx * f + rng.normal(0, noise)
            y = y0 + vy * f + rng.normal(0, noise)
            rows.append([f, tid, x, y, 50, 120, 1, 1, 1.0])
    np.savetxt(seq / "gt.txt", np.array(rows), delimiter=",")
    return root


def test_tracker_kf_type_mapping():
    assert tracker_kf_type("bytetrack") == "xyah"
    assert tracker_kf_type("OCSort") == "xysr"
    assert tracker_kf_type("boosttrack") == "xyhr"
    assert tracker_kf_type("sfsort") is None  # Kalman-free


def test_measurement_conversions():
    box = np.array([100.0, 50.0, 40.0, 80.0])
    np.testing.assert_allclose(_cxywh_to_measurement(box, "xywh"), [100, 50, 40, 80])
    np.testing.assert_allclose(_cxywh_to_measurement(box, "xyah"), [100, 50, 0.5, 80])
    np.testing.assert_allclose(_cxywh_to_measurement(box, "xysr"), [100, 50, 3200, 0.5])
    np.testing.assert_allclose(_cxywh_to_measurement(box, "xyhr"), [100, 50, 80, 0.5])


def test_estimate_recovers_noise_scale(tmp_path):
    # Constant-velocity tracks with additive N(0, sigma^2) position noise:
    # the acceleration of z = signal + e has variance 6 sigma^2
    # (second difference of white noise), so Q_vel ~ 6 * sigma^2.
    sigma = 2.0
    root = _synthetic_root(tmp_path, noise=sigma)
    res = estimate_kf_noise(root, kf_type="xywh", verbose=False)
    assert res["source"] == "GT-only"
    q_xy = res["Q_vel_diag"][:2]
    np.testing.assert_allclose(q_xy, 6 * sigma**2, rtol=0.35)
    # w/h are constant -> near-zero noise
    assert np.all(res["Q_vel_diag"][2:] < 1e-6)
    assert res["std_weight_position"] > 0


def test_estimate_R_from_detections(tmp_path):
    # dets = GT + N(0, 3^2) jitter on corners -> R captures the jitter
    root = _synthetic_root(tmp_path, noise=0.0)
    gt = np.loadtxt(root / "SEQ-01" / "gt" / "gt.txt", delimiter=",", ndmin=2)
    rng = np.random.default_rng(1)
    dets = []
    for row in gt:
        x1, y1 = row[2], row[3]
        x2, y2 = row[2] + row[4], row[3] + row[5]
        jit = rng.normal(0, 3.0, 4)
        dets.append([row[0], x1 + jit[0], y1 + jit[1], x2 + jit[2], y2 + jit[3], 0.9, 0])
    det_dir = tmp_path / "dets"
    det_dir.mkdir()
    np.save(det_dir / "SEQ-01.npy", np.array(dets, np.float32))
    R = estimate_R_from_detections(root, det_dir, kf_type="xywh")
    # center noise var = (3^2 + 3^2) / 4 = 4.5; size noise var = 18
    np.testing.assert_allclose(np.diag(R)[:2], 4.5, rtol=0.4)
    np.testing.assert_allclose(np.diag(R)[2:], 18.0, rtol=0.4)


def test_fixture_and_save(tmp_path):
    res = estimate_kf_noise(FIXTURE, kf_type="xyah", min_detections=2, per_class=True)
    assert res["Q"].shape == (8, 8)
    assert np.isfinite(res["std_weight_position"])
    out = tmp_path / "kf.json"
    save_kf_noise(res, out)
    import json

    loaded = json.loads(out.read_text())
    assert loaded["kf_type"] == "xyah"
    assert len(loaded["Q"]) == 8


def test_std_weights_thread_into_tracker():
    import jax.numpy as jnp

    from boxmot_tpu.trackers.bytetrack import ByteTrack

    IMG = np.zeros((240, 320, 3), np.uint8)
    d = np.array([[50, 50, 100, 170, 0.9, 0]], np.float32)
    default = ByteTrack()
    tuned = ByteTrack(std_weight_position=0.002, std_weight_velocity=0.002)
    assert tuned.cfg.std_weight_position == 0.002
    o1 = default.update(d, IMG)
    o2 = tuned.update(d, IMG)
    assert o1.shape == o2.shape == (1, 8)


class TestKfNoiseInjection:
    """tune-kf output feeds eval (reference _apply_kf_tuning_to_runtime,
    engine/eval/replay.py:142)."""

    def test_load_kf_noise_params(self, tmp_path):
        import json

        from boxmot_tpu.engine.eval import load_kf_noise_params

        blob = {"std_weight_position": 0.0023, "std_weight_velocity": 0.001,
                "Q": [[1.0]], "kf_type": "xyah"}
        p = tmp_path / "kf.json"
        p.write_text(json.dumps(blob))
        out = load_kf_noise_params(p)
        assert out == {"std_weight_position": 0.0023,
                       "std_weight_velocity": 0.001}
        # dict passthrough + missing keys tolerated
        assert load_kf_noise_params({"kf_type": "xyah"}) == {}

    def test_eval_applies_kf_noise(self):
        from pathlib import Path

        from boxmot_tpu.engine.eval import run_eval

        fixture = Path(__file__).parent.parent / "assets" / "MOT17-mini" / "train"
        noise = {"std_weight_position": 0.0023, "std_weight_velocity": 0.0023}
        res = run_eval(fixture, "bytetrack", kf_noise=noise)
        base = run_eval(fixture, "bytetrack")
        assert res["combined"]["HOTA"] > 0.3
        # calibration changes the association outcome vs defaults on this
        # fixture (sanity that injection took effect at all)
        assert res["combined"] != base["combined"]
        # explicit tracker_params beat the calibration file
        res2 = run_eval(
            fixture, "bytetrack",
            kf_noise={"std_weight_position": 0.0023,
                      "std_weight_velocity": 1.0 / 160},
            tracker_params={"std_weight_position": 1.0 / 20},
        )
        assert res2["combined"]["HOTA"] == base["combined"]["HOTA"]
