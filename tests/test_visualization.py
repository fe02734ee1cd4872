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


def test_show_kf_preds_draws_lost_track_predictions():
    """A track occluded mid-stream shows up ONLY via show_kf_preds, as a
    dashed KF-predicted box at roughly its extrapolated position
    (reference lost-track display, visualization.py:198,231)."""
    trk = ByteTrack()
    moving = lambda f: [40 + 8 * f, 40, 90 + 8 * f, 140, 0.9, 0]
    static = [200, 60, 250, 160, 0.8, 0]
    for f in range(6):
        trk.update(np.array([moving(f), static], np.float32), IMG)
    # occlude the moving object: it goes LOST but stays alive
    out = trk.update(np.array([static], np.float32), IMG)
    assert len(np.asarray(out.data)) == 1  # only the static track emitted
    assert trk._lost_display_rows and trk._lost_display_rows[0].shape[0] == 1
    lost_row = trk._lost_display_rows[0][0]
    # the KF prediction extrapolates the constant motion (~8 px/frame)
    assert 40 + 8 * 5 < lost_row[0] < 40 + 8 * 9

    plain = trk.plot_results(IMG.copy(), show_trajectories=False)
    with_preds = trk.plot_results(
        IMG.copy(), show_trajectories=False, show_kf_preds=True
    )
    assert (with_preds != 0).sum() > (plain != 0).sum()  # overlay drawn
    # the overlay lands in the predicted region, not at the last box
    x1 = int(lost_row[0])
    region = with_preds[:, max(0, x1 - 2): x1 + 60]
    assert (region != 0).any()


def test_show_kf_preds_obb_solid_polygon():
    """OBB predicted overlays draw as solid polygons (reference style
    rule: dashed only for AABB, visualization.py:198)."""
    trk = SFSORT()
    for f in range(5):
        trk.update(
            np.array([[100 + 5 * f, 100, 60, 24, 0.4, 0.9, 0]], np.float32), IMG
        )
    trk.update(np.zeros((0, 7), np.float32), IMG)  # occluded
    assert getattr(trk, "_lost_display_rows", None)
    plain = trk.plot_results(IMG.copy(), show_trajectories=False)
    with_preds = trk.plot_results(
        IMG.copy(), show_trajectories=False, show_kf_preds=True
    )
    assert (with_preds != 0).sum() > (plain != 0).sum()
