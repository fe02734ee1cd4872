"""Visualization mixin: colors, box drawing, trajectories, plot_results."""

import numpy as np

from boxmot_tpu.trackers.bytetrack import ByteTrack
from boxmot_tpu.trackers.sfsort import SFSORT

IMG = np.zeros((240, 320, 3), np.uint8)


def _run_frames(trk, n=5):
    out = None
    for f in range(n):
        d = np.array(
            [
                [40 + 6 * f, 40 + 3 * f, 90 + 6 * f, 140 + 3 * f, 0.9, 0],
                [200, 60, 250, 160, 0.8, 0],
            ],
            np.float32,
        )
        out = trk.update(d, IMG)
    return out


def test_id_to_color_stable_distinct():
    trk = ByteTrack()
    c1 = trk.id_to_color(1)
    assert c1 == trk.id_to_color(1)
    assert c1 != trk.id_to_color(2)
    assert all(0 <= v <= 255 for v in c1)
    assert trk.id_to_color(3, state="removed") == (0, 0, 255)


def test_target_id_highlighting():
    trk = ByteTrack()
    trk.target_id = 7
    assert trk.id_to_color(7) == (0, 255, 0)
    assert trk.id_to_color(8) == (0, 0, 0)


def test_plot_results_draws_tracks_and_trajectories():
    trk = ByteTrack()
    _run_frames(trk)
    canvas = trk.plot_results(IMG.copy(), show_trajectories=True)
    assert canvas.shape == IMG.shape
    assert (canvas != 0).sum() > 500  # boxes + labels + dots were drawn
    # without trajectories fewer pixels are set
    canvas2 = trk.plot_results(IMG.copy(), show_trajectories=False)
    assert 0 < (canvas2 != 0).sum() < (canvas != 0).sum()


def test_plot_results_obb_polygons():
    trk = SFSORT()
    for f in range(4):
        trk.update(
            np.array([[100 + 5 * f, 100, 60, 24, 0.4, 0.9, 0]], np.float32), IMG
        )
    canvas = trk.plot_results(IMG.copy(), show_trajectories=True)
    assert (canvas != 0).sum() > 200


def test_plot_box_on_img_dashed():
    trk = ByteTrack()
    img = trk.plot_box_on_img(
        IMG.copy(), (10, 10, 100, 100), 0.9, 0, 5, style="dashed"
    )
    assert (img != 0).sum() > 50


def test_history_bounded():
    # max_obs is clamped to max_age + 5 when smaller (reference semantics),
    # so shrink max_age too
    trk = ByteTrack(max_obs=5, max_age=3)
    for f in range(12):
        trk.update(np.array([[40 + f, 40, 90 + f, 140, 0.9, 0]], np.float32), IMG)
    assert len(trk._display_history[1]) == 5
