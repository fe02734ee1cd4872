"""ByteTrack SoA step: contract tests + scenario parity vs the numpy oracle."""

import numpy as np
import pytest

from boxmot_tpu.trackers.bytetrack import ByteTrack
from tests.oracle.bytetrack_np import ByteTrackOracle

IMG = np.zeros((480, 640, 3), np.uint8)


def moving_scene(n_frames=40, n_obj=6, seed=0, drop_p=0.15, low_conf_p=0.25):
    """Synthetic scene: linearly moving boxes with noise/dropouts."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(50, 500, (n_obj, 2))
    vel = rng.uniform(-4, 4, (n_obj, 2))
    size = rng.uniform(30, 80, (n_obj, 2))
    frames = []
    for f in range(n_frames):
        dets = []
        for i in range(n_obj):
            p = pos[i] + vel[i] * f
            if not (0 < p[0] < 600 and 0 < p[1] < 440):
                continue
            if rng.uniform() < drop_p:
                continue
            jitter = rng.normal(0, 1.5, 2)
            x1, y1 = p + jitter
            w, h = size[i] * rng.uniform(0.95, 1.05, 2)
            conf = (
                rng.uniform(0.15, 0.44)
                if rng.uniform() < low_conf_p
                else rng.uniform(0.5, 0.95)
            )
            dets.append([x1, y1, x1 + w, y1 + h, conf, 0.0])
        # clutter
        if rng.uniform() < 0.3:
            x1, y1 = rng.uniform(0, 500, 2)
            dets.append([x1, y1, x1 + 40, y1 + 60, rng.uniform(0.5, 0.9), 0.0])
        frames.append(np.array(dets, np.float32).reshape(-1, 6))
    return frames


def run_pair(frames, **kw):
    trk = ByteTrack(**kw)
    orc = ByteTrackOracle(**kw)
    outs_t, outs_o = [], []
    for dets in frames:
        outs_t.append(np.asarray(trk.update(dets, IMG)))
        outs_o.append(orc.update(dets))
    return outs_t, outs_o


def by_id(rows):
    return {int(r[4]): r for r in rows}


class TestContract:
    def test_output_shape(self):
        trk = ByteTrack()
        dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        out = trk.update(dets, IMG)
        assert out.shape[1] == 8
        assert out.shape[0] == 1  # first-frame tracks activate immediately
        assert out.id[0] == 1

    def test_no_detections(self):
        trk = ByteTrack()
        out = trk.update(np.empty((0, 6), np.float32), IMG)
        assert out.shape == (0, 0) or out.shape[0] == 0
        dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        trk.update(dets, IMG)
        out = trk.update(np.empty((0, 6), np.float32), IMG)
        assert out.shape[0] == 0

    def test_accessors(self):
        trk = ByteTrack()
        dets = np.array(
            [[10, 10, 60, 100, 0.9, 2.0], [200, 50, 260, 150, 0.8, 3.0]], np.float32
        )
        out = trk.update(dets, IMG)
        assert set(out.cls.tolist()) == {2.0, 3.0}
        assert set(out.det_ind.tolist()) == {0.0, 1.0}
        assert out.xyxy.shape == (2, 4)

    def test_stable_ids_over_frames(self):
        trk = ByteTrack()
        ids_per_frame = []
        for f in range(10):
            dets = np.array(
                [
                    [10 + 2 * f, 10, 60 + 2 * f, 100, 0.9, 0.0],
                    [300, 200 + 3 * f, 360, 300 + 3 * f, 0.85, 0.0],
                ],
                np.float32,
            )
            out = trk.update(dets, IMG)
            ids_per_frame.append(sorted(out.id.astype(int).tolist()))
        assert all(ids == ids_per_frame[0] for ids in ids_per_frame)
        assert ids_per_frame[0] == [1, 2]

    def test_low_conf_ignored_for_new_tracks(self):
        trk = ByteTrack(track_thresh=0.5)
        dets = np.array([[10, 10, 60, 100, 0.3, 0.0]], np.float32)
        out = trk.update(dets, IMG)
        assert out.shape[0] == 0

    def test_track_buffer_expiry(self):
        trk = ByteTrack(track_buffer=3)
        dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        trk.update(dets, IMG)
        trk.update(dets, IMG)
        for _ in range(6):
            trk.update(np.empty((0, 6), np.float32), IMG)
        # Reappearance far in the future must get a new id
        out = trk.update(dets, IMG)
        # new track this frame is unconfirmed (frame > 1), so no output yet
        out = trk.update(dets, IMG)
        assert out.shape[0] == 1
        assert int(out.id[0]) != 1

    def test_reset(self):
        trk = ByteTrack()
        dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        trk.update(dets, IMG)
        trk.reset()
        out = trk.update(dets, IMG)
        assert int(out.id[0]) == 1


class TestOracleParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_synthetic_scene_parity(self, seed):
        frames = moving_scene(n_frames=40, seed=seed)
        outs_t, outs_o = run_pair(frames)
        mismatch_frames = 0
        for f, (rt, ro) in enumerate(zip(outs_t, outs_o)):
            dt, do = by_id(rt), by_id(ro)
            if set(dt) != set(do):
                mismatch_frames += 1
                continue
            for tid, row in dt.items():
                ref = do[tid]
                np.testing.assert_allclose(row[:4], ref[:4], atol=0.5, rtol=1e-3)
                assert row[6] == ref[6]  # cls
                assert row[7] == ref[7]  # det_ind
        # Allow rare divergence from assignment ties; overall must agree.
        assert mismatch_frames <= 1, f"{mismatch_frames} mismatching frames"

    def test_dense_crossing_parity(self):
        # Two objects crossing paths — the association stress case.
        frames = []
        for f in range(30):
            a = [50 + 8 * f, 100, 110 + 8 * f, 220, 0.9, 0.0]
            b = [290 - 8 * f, 105, 350 - 8 * f, 225, 0.85, 0.0]
            frames.append(np.array([a, b], np.float32))
        outs_t, outs_o = run_pair(frames)
        for rt, ro in zip(outs_t, outs_o):
            assert set(by_id(rt)) == set(by_id(ro))

    def test_low_conf_second_stage_parity(self):
        # Object fades to low confidence: second association keeps it alive.
        frames = []
        for f in range(20):
            conf = 0.9 if f < 8 else 0.3
            frames.append(
                np.array([[100 + 3 * f, 100, 160 + 3 * f, 220, conf, 0.0]], np.float32)
            )
        outs_t, outs_o = run_pair(frames)
        for f, (rt, ro) in enumerate(zip(outs_t, outs_o)):
            assert set(by_id(rt)) == set(by_id(ro)), f"frame {f}"
