"""Host-side tracker shell around the jitted device step.

Architectural inversion of the reference BaseTracker
(boxmot/trackers/basetracker.py:15-557): the reference keeps one Python
object per track and loops on the host; here ALL tracker state lives in
fixed-capacity device arrays (a flax.struct pytree) and one jitted step
function advances a whole frame.  This class keeps only what cannot be
traced: input unwrapping, detection-layout inference, first-frame setup,
per-class state dispatch, padding to static shapes, and TrackResults
wrapping.  The public `update(dets, img, embs, masks)` contract is
identical to the reference (same (M,8)/(M,9) outputs).
"""

from __future__ import annotations

import numpy as np

from boxmot_tpu.trackers.per_class_ids import GlobalIdAllocator
from boxmot_tpu.trackers.track_results import TrackResults

_DET_BUCKETS = (16, 32, 64, 128, 256, 512)


def det_bucket(n: int) -> int:
    """Static padding size for n detections (bounds jit recompiles)."""
    for b in _DET_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"too many detections for one frame: {n}")


class DetectionLayout:
    """Column schema for AABB vs OBB detections (mirror of
    boxmot/trackers/common/detection_layout.py:9-104)."""

    def __init__(self, is_obb: bool):
        self.is_obb = is_obb
        self.det_cols = 7 if is_obb else 6
        self.box_cols = 5 if is_obb else 4
        self.conf_idx = self.box_cols
        self.cls_idx = self.box_cols + 1
        self.output_cols = 9 if is_obb else 8


AABB_LAYOUT = DetectionLayout(False)
OBB_LAYOUT = DetectionLayout(True)


def infer_detection_layout(dets):
    if dets is None or not isinstance(dets, np.ndarray) or dets.ndim != 2:
        return None
    if dets.shape[1] == 6:
        return AABB_LAYOUT
    if dets.shape[1] == 7:
        return OBB_LAYOUT
    return None


from boxmot_tpu.trackers.visualization import VisualizationMixin


class BaseTracker(VisualizationMixin):
    """Shared host shell; subclasses provide the device state + step."""

    supports_obb = False
    supports_masks = False

    def __init__(
        self,
        det_thresh: float = 0.3,
        max_age: int = 30,
        max_obs: int = 50,
        min_hits: int = 3,
        iou_threshold: float = 0.3,
        per_class: bool = False,
        nr_classes: int = 80,
        asso_func: str = "iou",
        is_obb: bool = False,
        **kwargs,
    ):
        self.det_thresh = det_thresh
        self.max_age = max_age
        self.max_obs = max_obs if max_obs > max_age else max_age + 5
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.per_class = per_class
        self.nr_classes = nr_classes
        self.asso_func_name = asso_func
        self.is_obb = is_obb
        self.layout = OBB_LAYOUT if is_obb else AABB_LAYOUT

        self.frame_count = 0
        self.h = None
        self.w = None
        self._first_dets_processed = False
        self._first_frame_processed = False

        # lost-track KF predictions from the latest update (show_kf_preds)
        self._lost_display_rows: list = []
        # Device state: one pytree, or one per class when per_class.
        self._state = None
        self._per_class_states = {} if per_class else None
        # Reference-style global sequential ids across classes (the
        # reference shares one creation counter over all classes —
        # trackers/basetracker.py:228 + per-type track-class counters).
        self._pc_ids = GlobalIdAllocator() if per_class else None

    # -- subclass contract --------------------------------------------

    def _init_state(self):
        """Return a fresh device state pytree."""
        raise NotImplementedError

    def _step(self, state, dets_padded, det_valid):
        """Advance one frame.  Returns (state, out (K, out_cols), out_mask)."""
        raise NotImplementedError

    # -- public API ----------------------------------------------------

    def update(self, dets, img=None, embs=None, masks=None) -> TrackResults:
        dets, img = self._preprocess(dets, img)
        self._lost_display_rows = []  # refilled by _run_class each frame
        raw = self._do_update(dets, img, embs, masks)
        results = TrackResults(raw)
        self._record_display(results, max_obs=getattr(self, "max_obs", 50))
        return results

    def _lost_mask(self, state):
        """Boolean (K,) mask of alive-but-unmatched slots.  Their `out`
        rows carry the KF-predicted box for the current frame, which is
        exactly what show_kf_preds overlays draw (reference lost-track
        display, trackers/common/visualization.py:198,231 +
        basetracker.py:518-521).  Trackers with bespoke status encodings
        override this."""
        if hasattr(state, "active") and hasattr(state, "tsu"):
            return np.asarray(state.active) & (np.asarray(state.tsu) > 0)
        return None

    def reset(self):
        self._state = None
        if self.per_class:
            self._per_class_states = {}
            self._pc_ids = GlobalIdAllocator()
        self.frame_count = 0

    # -- internals -----------------------------------------------------

    def _preprocess(self, dets, img):
        if hasattr(dets, "data"):
            dets = dets.data
        if isinstance(dets, memoryview):
            dets = np.array(dets, dtype=np.float32)
        if dets is not None:
            dets = np.asarray(dets, dtype=np.float32)

        if not self._first_dets_processed and dets is not None:
            layout = infer_detection_layout(dets)
            if layout is not None:
                if layout.is_obb and not self.supports_obb:
                    raise AssertionError(
                        f"{type(self).__name__} does not support OBB detections."
                    )
                self._set_detection_mode(layout.is_obb)
                self._first_dets_processed = True

        if not self._first_frame_processed and img is not None:
            self.h, self.w = img.shape[0:2]
            self._first_frame_processed = True
            self._set_frame_size(float(self.w), float(self.h))

        return dets, img

    def _set_frame_size(self, w: float, h: float):
        """First-frame hook for trackers whose association needs the
        frame size (centroid family — reference basetracker.py:177-181
        builds AssociationFunction from the first img's w/h)."""

    def _set_detection_mode(self, is_obb: bool):
        if is_obb != self.is_obb:
            self.is_obb = is_obb
            self.layout = OBB_LAYOUT if is_obb else AABB_LAYOUT
            self._state = None  # state shape depends on mode

    def _validate(self, dets):
        assert dets.ndim == 2, "Unsupported 'dets' dimensions, valid number of dimensions is two"
        assert dets.shape[1] == self.layout.det_cols, (
            f"Unsupported 'dets' 2nd dimension length, valid length is "
            f"{self.layout.det_cols}"
        )

    def _pad_dets(self, dets):
        """Append det indices and pad to a static bucket.

        Padding rows carry conf = -1 so det_valid = conf >= 0; their boxes
        are unit boxes so downstream geometry (e.g. aspect = w/h) never
        produces NaN even before masking.
        """
        n = len(dets)
        D = det_bucket(max(n, 1))
        cols = self.layout.det_cols + 1
        padded = np.zeros((D, cols), np.float32)
        if self.layout.is_obb:
            padded[:, 2:4] = 1.0  # w, h
        else:
            padded[:, 2:4] = 1.0  # x2, y2 (unit box at origin)
        padded[:, self.layout.conf_idx] = -1.0
        if n:
            padded[:n, : self.layout.det_cols] = dets
            padded[:n, -1] = np.arange(n, dtype=np.float32)
        return padded, n

    def _do_update(self, dets, img, embs=None, masks=None):
        if dets is None or len(dets) == 0:
            dets = np.empty((0, self.layout.det_cols), np.float32)
        self._validate(dets)

        if not self.per_class:
            return self._run_class(None, dets, embs)

        outputs = []
        frame_count = self.frame_count
        for cls_id in range(self.nr_classes):
            cls_mask = dets[:, self.layout.cls_idx] == cls_id
            class_dets = dets[cls_mask]
            class_embs = embs[cls_mask] if embs is not None else None
            self.frame_count = frame_count
            out = self._run_class(cls_id, class_dets, class_embs)
            if out.size > 0:
                outputs.append(out)
        self.frame_count = frame_count + 1
        if outputs:
            return np.vstack(outputs)
        return np.empty((0, self.layout.output_cols), np.float32)

    # Emitted ids differ from the internal ``next_id`` counter by a
    # fixed offset per tracker (hybridsort emits tid + 1).
    _id_emit_offset = 0

    def _run_class(self, cls_id, dets, embs):
        if cls_id is None:
            state = self._state if self._state is not None else self._init_state()
        else:
            state = self._per_class_states.get(cls_id)
            if state is None:
                state = self._init_state()
                # each class bank counts its own ids in a disjoint raw
                # range; the GlobalIdAllocator below renumbers them to
                # the reference's shared-counter sequence at emission
                if hasattr(state, "next_id"):
                    import jax.numpy as jnp

                    state = state.replace(
                        next_id=state.next_id + cls_id * 1_000_000
                    )

        track_ids = cls_id is not None and hasattr(state, "next_id")
        if track_ids:
            prev_next = int(state.next_id) + self._id_emit_offset

        padded, n = self._pad_dets(dets)
        import jax.numpy as jnp

        det_valid = padded[:, self.layout.conf_idx] >= 0.0
        state, out, out_mask = self._step(
            state, jnp.asarray(padded), jnp.asarray(det_valid)
        )

        if cls_id is None:
            self._state = state
        else:
            self._per_class_states[cls_id] = state
        self.frame_count += 1

        all_np = np.asarray(out)
        mask_np = np.asarray(out_mask)
        out_np = all_np[mask_np]
        if track_ids:
            new_next = int(state.next_id) + self._id_emit_offset
            self._pc_ids.observe_created(prev_next, new_next)
            if out_np.size:
                id_col = self.layout.box_cols
                out_np = out_np.copy()
                out_np[:, id_col] = self._pc_ids.remap(out_np[:, id_col])
        # lost-track KF predictions for show_kf_preds overlays
        lm = self._lost_mask(state)
        if lm is not None:
            lost_sel = np.asarray(lm) & ~mask_np
            if lost_sel.any():
                lost_np = all_np[lost_sel].copy()
                if track_ids:
                    id_col = self.layout.box_cols
                    lost_np[:, id_col] = self._pc_ids.remap(lost_np[:, id_col])
                self._lost_display_rows.append(lost_np)
        return out_np
