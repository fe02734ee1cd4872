"""Fused live tracking: detector + crops + ReID + tracker in ONE program.

The staged live pipeline (engine/inference.py DetectorReIDPipeline +
tracker.update) dispatches detector forward, ReID embed, and the tracker
step as separate device programs with host round-trips between them —
the layout the reference uses because its stages live in different
runtimes (boxmot/engine/tracking/inference.py:73-263).  On TPU all three
stages are jittable, so this module fuses the whole per-frame path into
a single XLA program:

    YOLOX forward -> grid decode -> device NMS -> device crops ->
    ReID embed -> tracker step

One dispatch per frame; the only host work is the letterbox resize (a
cv2 call, matching the reference's preprocessing exactly) and the final
emitted-row slice.  Detections, crops, and embeddings never leave the
device between stages, and XLA fuses the glue (coordinate rescale,
standardize-undo, padding masks) into the surrounding matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boxmot_tpu.ops.precision import tracker_jit


class FusedLiveTracker:
    """Single-dispatch live tracker.

    detector: YoloXDetector (models/yolox.py flax net + device NMS).
    reid: ReID facade (reid/core.py) or None for motion-only trackers.
    tracker_type/tracker_params: any device tracker from the zoo.
    max_dets: static per-frame detection capacity (NMS output size).
    """

    def __init__(
        self,
        detector,
        reid=None,
        tracker_type: str = "occluboost",
        tracker_params: dict | None = None,
        max_dets: int = 64,
    ):
        from boxmot_tpu.engine.eval import build_replay_config
        from boxmot_tpu.engine.replay import resolve_tracker
        from boxmot_tpu.ops.crops import (
            IMAGENET_MEAN,
            IMAGENET_STD,
            crop_resize_aabb,
            standardize,
        )
        from boxmot_tpu.ops.nms import nms as nms_op, yolox_decode

        self.detector = detector
        self.reid = reid
        params = dict(tracker_params or {})
        if reid is not None:
            params.setdefault("feat_dim", reid.feature_dim)
            params.setdefault("with_reid", True)
        else:
            params.setdefault("with_reid", False)
        self.cfg = build_replay_config(tracker_type, **params)
        init_state, step = resolve_tracker(self.cfg)
        self._state = init_state(self.cfg)
        self.max_dets = int(max_dets)
        self.frame_count = 0

        det_model = detector.model
        img_hw = detector.imgsz
        conf_thr = float(detector.conf)
        iou_thr = float(detector.iou)
        reid_model = reid.model if reid is not None else None
        crop_hw = reid.crop_hw if reid is not None else (2, 2)
        feat_dim = getattr(self.cfg, "feat_dim", 1)
        D = self.max_dets
        cfg = self.cfg
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        det_half = bool(getattr(detector, "half", False))
        reid_half = bool(getattr(reid, "half", False)) if reid is not None else False

        @tracker_jit
        def _program(det_vars, reid_vars, state, frame_u8, scale):
            # --- normalize on device: the host ships the uint8
            # letterbox (4x smaller over the interconnect; the BGR flip
            # + /255 + ImageNet standardize are elementwise and fuse
            # into the first conv's input)
            frame_std = (frame_u8[:, :, ::-1].astype(jnp.float32) / 255.0 - mean) / std
            # --- detect: forward + decode + NMS, all on device
            # (bf16 forward when the detector was built half; decode/NMS
            # stay fp32 either way)
            det_in = frame_std.astype(jnp.bfloat16) if det_half else frame_std
            raw = det_model.apply(det_vars, det_in[None])[0].astype(jnp.float32)
            boxes, obj, cls = yolox_decode(raw, img_hw=img_hw)
            cls_conf = jnp.max(cls, axis=-1)
            cls_id = jnp.argmax(cls, axis=-1).astype(jnp.float32)
            score = obj * cls_conf
            valid = score >= conf_thr
            keep_idx, keep_mask = nms_op(
                boxes, jnp.where(valid, score, -1.0), iou_thr, D
            )
            idx = jnp.clip(keep_idx, 0, boxes.shape[0] - 1)
            boxes_lb = boxes[idx]  # letterbox coords, for device crops
            # padded det rows: unit boxes + conf -1 (BaseTracker._pad_dets)
            unit = jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
            det_box = jnp.where(keep_mask[:, None], boxes_lb / scale, unit)
            det_conf = jnp.where(keep_mask, score[idx], -1.0)
            dets = jnp.concatenate(
                [
                    det_box,
                    det_conf[:, None],
                    cls_id[idx][:, None],
                    jnp.arange(D, dtype=jnp.float32)[:, None],
                ],
                axis=1,
            )
            # --- embed: crops gathered from the SAME letterboxed tensor
            # (undo the ImageNet standardize instead of shipping a second
            # copy of the frame — elementwise, fused by XLA)
            if reid_model is not None:
                rgb01 = frame_std * std + mean
                crop_box = jnp.where(keep_mask[:, None], boxes_lb, unit)
                crops = standardize(crop_resize_aabb(rgb01, crop_box, crop_hw))
                if reid_half:
                    crops = crops.astype(jnp.bfloat16)
                feats = reid_model.apply(reid_vars, crops).astype(jnp.float32)
                feats = feats / jnp.maximum(
                    jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
                )
                embs = jnp.where(keep_mask[:, None], feats, 0.0)
            else:
                embs = jnp.zeros((D, feat_dim), jnp.float32)
            # --- track
            warp = jnp.broadcast_to(jnp.eye(2, 3, dtype=jnp.float32), (2, 3))
            state, out, out_mask = step(cfg, state, dets, keep_mask, embs, warp)
            return state, out, out_mask

        self._program = _program

    def reset(self):
        from boxmot_tpu.engine.replay import resolve_tracker

        init_state, _ = resolve_tracker(self.cfg)
        self._state = init_state(self.cfg)
        self.frame_count = 0

    def warmup(self, frame_hw=(720, 1280)):
        """Compile the program once on a dummy frame."""
        self.update(np.zeros((*frame_hw, 3), np.uint8))
        self.reset()

    def update_async(self, frame_bgr: np.ndarray):
        """Advance one frame WITHOUT reading results back — the state
        stays on device and dispatch stays asynchronous (throughput mode;
        see docs/performance.md on tunnel dispatch poisoning).  Returns
        (out, out_mask) device arrays; slice on host when needed."""
        padded, r = self.detector.preprocess_u8(frame_bgr)
        reid_vars = self.reid.variables if self.reid is not None else {}
        self._state, out, mask = self._program(
            self.detector.variables,
            reid_vars,
            self._state,
            jnp.asarray(padded),
            jnp.float32(r),
        )
        self.frame_count += 1
        return out, mask

    def update(self, frame_bgr: np.ndarray):
        """frame -> TrackResults, one fused device dispatch."""
        from boxmot_tpu.trackers.track_results import TrackResults

        out, mask = self.update_async(frame_bgr)
        rows = np.asarray(out)[np.asarray(mask)]
        return TrackResults(rows)
