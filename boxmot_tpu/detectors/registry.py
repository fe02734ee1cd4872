"""Detector registry: name -> backend class by filename heuristics.

Mirror of boxmot/detectors/registry.py:41-132: yolox_* weights map to
the YOLOX backend, rtdetr_* to the HF-transformers RT-DETR pipeline,
anything else to the ultralytics adapter.  Backends whose runtime
dependency or weights are unavailable raise a clear error at
construction, not at import.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from boxmot_tpu.detectors.base import BaseDetectorBackend, Detections


class PublicDetections(BaseDetectorBackend):
    """Replays per-frame public detections (det.txt) as a detector.

    The cached-benchmark path (yolox_x et al.) uses pre-generated
    detections; this backend serves the same role for sources that ship
    MOT-style det files."""

    def __init__(self, dets_per_frame, **kwargs):
        super().__init__(**kwargs)
        self.dets_per_frame = dets_per_frame
        self._frame = 0

    def preprocess(self, img):
        return img, None

    def process(self, batch):
        idx = self._frame
        self._frame += 1
        if idx < len(self.dets_per_frame):
            return self.dets_per_frame[idx]
        import numpy as np

        return np.zeros((0, 6), np.float32)

    def postprocess(self, raw, meta) -> Detections:
        return Detections(xyxy=raw[:, :4], conf=raw[:, 4], cls=raw[:, 5])


def _as_numpy(values) -> np.ndarray:
    """Torch tensors (cuda or cpu) and arrays -> float32 numpy
    (reference boxmot/detectors/ultralytics.py:151-156)."""
    if hasattr(values, "cpu"):
        values = values.cpu()
    if hasattr(values, "numpy"):
        values = values.numpy()
    return np.asarray(values, dtype=np.float32)


class UltralyticsDetector(BaseDetectorBackend):
    """Adapter over the ultralytics YOLO predictor
    (reference boxmot/detectors/ultralytics.py:17-204), covering all
    three result families the reference extracts:

      * detect models  -> result.boxes  {xyxy, conf, cls}
      * segment models -> result.boxes + result.masks.data (binarized
        at 0.5 to uint8, ultralytics.py:183-189)
      * OBB models     -> result.obb {xywhr, conf, cls} -> (N,7) dets
        (ultralytics.py:166-172)
      * pose models    -> result.boxes as usual (the reference tracks
        pose models through their boxes, ci.yml:398-424) + keypoints
        carried on Detections.keypoints for track re-association
    """

    def __init__(self, weights, device=None, half=False, conf=0.25,
                 iou=0.7, classes=None, agnostic_nms=False, **kwargs):
        super().__init__(weights, device, half)
        if Path(str(weights)).stem.lower().startswith("yololite"):
            # vendored offline predictor with the same result surface
            from boxmot_tpu.detectors.yolo_lite import LiteYOLO  # noqa: PLC0415

            self.model = LiteYOLO(str(weights))
        else:
            try:
                from ultralytics import YOLO  # noqa: PLC0415
            except ImportError as exc:
                raise ImportError(
                    "ultralytics is not installed in this environment; install "
                    "it, use the vendored predictor (--detector yololite[-seg|"
                    "-obb|-pose]), or replay cached detections "
                    "(--detector public)"
                ) from exc
            self.model = YOLO(str(weights))
        self.conf = conf
        self.iou = iou
        self.classes = classes
        self.agnostic_nms = agnostic_nms

    def preprocess(self, img):
        return img, None

    def process(self, batch):
        kwargs = {"conf": self.conf, "verbose": False}
        # only pass non-default knobs: recorded fakes and older
        # predictor signatures need not accept every option
        if self.iou != 0.7:
            kwargs["iou"] = self.iou
        if self.classes is not None:
            kwargs["classes"] = self.classes
        if self.agnostic_nms:
            kwargs["agnostic_nms"] = True
        return self.model.predict(batch, **kwargs)[0]

    def postprocess(self, raw, meta) -> Detections:
        obb = getattr(raw, "obb", None)
        if obb is not None:
            if len(obb) == 0:
                return Detections(
                    xyxy=np.zeros((0, 4), np.float32),
                    conf=np.zeros((0,), np.float32),
                    cls=np.zeros((0,), np.float32),
                    is_obb=True,
                    xywha=np.zeros((0, 5), np.float32),
                )
            xywhr = _as_numpy(obb.xywhr)
            conf = _as_numpy(obb.conf).reshape(-1)
            cls = _as_numpy(obb.cls).reshape(-1)
            # axis-aligned hull of the rotated rect (host numpy)
            cx, cy, w, h, a = xywhr.T
            ex = np.abs(w / 2 * np.cos(a)) + np.abs(h / 2 * np.sin(a))
            ey = np.abs(w / 2 * np.sin(a)) + np.abs(h / 2 * np.cos(a))
            xyxy = np.stack(
                [cx - ex, cy - ey, cx + ex, cy + ey], axis=1
            ).astype(np.float32)
            return Detections(
                xyxy=xyxy, conf=conf, cls=cls, is_obb=True, xywha=xywhr
            )

        boxes = raw.boxes
        if boxes is None or len(boxes) == 0:
            return Detections(
                xyxy=np.zeros((0, 4), np.float32),
                conf=np.zeros((0,), np.float32),
                cls=np.zeros((0,), np.float32),
            )
        masks = None
        raw_masks = getattr(raw, "masks", None)
        if raw_masks is not None and len(raw_masks) > 0:
            masks = (_as_numpy(raw_masks.data) > 0.5).astype(np.uint8)
        keypoints = None
        raw_kpts = getattr(raw, "keypoints", None)
        if raw_kpts is not None and len(raw_kpts) > 0:
            keypoints = _as_numpy(raw_kpts.data)  # (N, K, 3)
        return Detections(
            xyxy=_as_numpy(boxes.xyxy),
            conf=_as_numpy(boxes.conf).reshape(-1),
            cls=_as_numpy(boxes.cls).reshape(-1),
            masks=masks,
            keypoints=keypoints,
        )


class RTDetrDetector(BaseDetectorBackend):
    """HF-transformers RT-DETR adapter (detectors/rtdetr.py:15)."""

    def __init__(self, weights, device=None, half=False, conf=0.5, **kwargs):
        super().__init__(weights, device, half)
        try:
            from transformers import AutoModelForObjectDetection, AutoImageProcessor  # noqa: PLC0415
        except ImportError as exc:
            raise ImportError("transformers is required for RT-DETR") from exc
        self.processor = AutoImageProcessor.from_pretrained(str(weights))
        self.model = AutoModelForObjectDetection.from_pretrained(str(weights))
        self.conf = conf

    def preprocess(self, img):
        import torch  # noqa: PLC0415

        inputs = self.processor(images=img[..., ::-1], return_tensors="pt")
        return inputs, img.shape[:2]

    def process(self, batch):
        import torch  # noqa: PLC0415

        with torch.no_grad():
            return self.model(**batch)

    def postprocess(self, raw, meta) -> Detections:
        import numpy as np
        import torch  # noqa: PLC0415

        res = self.processor.post_process_object_detection(
            raw, threshold=self.conf, target_sizes=[meta]
        )[0]
        return Detections(
            xyxy=res["boxes"].numpy(),
            conf=res["scores"].numpy(),
            cls=res["labels"].numpy().astype(np.float32),
        )


class YoloXDetector(BaseDetectorBackend):
    """YOLOX backend, fully TPU-native: letterbox on host (the ByteTrack
    preprocessing the reference uses, detectors/yolox.py:201-237), then
    one jitted device program for backbone forward + grid decode + NMS
    (models/yolox.py + ops/nms.py).  Weights are yolox torch checkpoints
    converted on load (models/yolox.convert_yolox); without a weights
    file the net is randomly initialized (useful for shape/perf work
    only)."""

    MAX_DETS = 256

    def __init__(
        self,
        weights,
        device=None,
        half: bool = False,
        imgsz=(800, 1440),
        conf: float = 0.01,
        iou: float = 0.7,
        num_classes: int = 1,
        **kwargs,
    ):
        super().__init__(weights, device, half)
        import jax
        import jax.numpy as jnp
        from functools import partial

        from boxmot_tpu.models.yolox import build_yolox, convert_yolox
        from boxmot_tpu.ops.nms import nms as nms_op, yolox_decode

        vals = imgsz if isinstance(imgsz, (list, tuple)) else (imgsz,)
        h, w = (tuple(vals) * 2)[:2]
        self.imgsz = (int(h), int(w))
        self.conf = float(conf)
        self.iou = float(iou)
        name = Path(str(weights)).stem if weights is not None else "yolox_x"
        self.model = build_yolox(name, num_classes=num_classes)
        if weights is not None and Path(str(weights)).exists():
            self.variables = convert_yolox(str(weights), name, num_classes)
        else:
            rng = jax.random.PRNGKey(0)
            self.variables = self.model.init(
                rng, jnp.zeros((1, *self.imgsz, 3), jnp.float32)
            )
        if half:
            # bf16 params + activations on the MXU (the reference's
            # half=True FP16 tier, detectors/yolox.py:166); grid decode
            # + NMS stay fp32 below.  Throughput option — box coords
            # quantize at bf16's ~8-bit mantissa, so parity tests and
            # cache generation keep the fp32 default.
            self.variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.asarray(x).dtype == jnp.float32
                else x,
                self.variables,
            )

        model = self.model
        img_hw = self.imgsz
        max_dets = self.MAX_DETS

        @partial(jax.jit, static_argnames=())
        def _forward(variables, img, conf_thr, iou_thr):
            if half:
                img = img.astype(jnp.bfloat16)
            raw = model.apply(variables, img[None])[0].astype(jnp.float32)
            boxes, obj, cls = yolox_decode(raw, img_hw=img_hw)
            cls_conf = jnp.max(cls, axis=-1)
            cls_id = jnp.argmax(cls, axis=-1).astype(jnp.float32)
            score = obj * cls_conf  # final conf = obj * class (yolox.py:258)
            valid = score >= conf_thr
            keep_idx, keep_mask = nms_op(
                boxes, jnp.where(valid, score, -1.0), iou_thr, max_dets
            )
            return boxes, score, cls_id, keep_idx, keep_mask

        self._forward = _forward

    def preprocess(self, img: np.ndarray):
        """ByteTrack letterbox: resize to fit, pad 114, RGB/255 then
        ImageNet standardize (detectors/yolox.py:201-237)."""
        import cv2

        ih, iw = self.imgsz
        r = min(ih / img.shape[0], iw / img.shape[1])
        resized = cv2.resize(
            img,
            (int(img.shape[1] * r), int(img.shape[0] * r)),
            interpolation=cv2.INTER_LINEAR,
        ).astype(np.float32)
        padded = np.full((ih, iw, 3), 114.0, np.float32)
        padded[: resized.shape[0], : resized.shape[1]] = resized
        padded = padded[:, :, ::-1] / 255.0
        padded = (padded - (0.485, 0.456, 0.406)) / (0.229, 0.224, 0.225)
        return padded.astype(np.float32), r

    def preprocess_u8(self, img: np.ndarray):
        """Letterbox only, staying uint8 (3.5 MB vs 13.8 MB for the
        fp32 tensor at 800x1440) — the BGR flip + /255 + ImageNet
        standardize runs on device instead (engine/fused.py).  cv2
        resizes the uint8 input either way, so this is bit-identical
        input data to :meth:`preprocess`, just normalized later."""
        import cv2

        ih, iw = self.imgsz
        r = min(ih / img.shape[0], iw / img.shape[1])
        resized = cv2.resize(
            img,
            (int(img.shape[1] * r), int(img.shape[0] * r)),
            interpolation=cv2.INTER_LINEAR,
        )
        padded = np.full((ih, iw, 3), 114, np.uint8)
        padded[: resized.shape[0], : resized.shape[1]] = resized
        return padded, r

    def process(self, batch):
        import jax.numpy as jnp

        img, r = batch
        boxes, score, cls_id, keep_idx, keep_mask = self._forward(
            self.variables, jnp.asarray(img), self.conf, self.iou
        )
        return (np.asarray(boxes), np.asarray(score), np.asarray(cls_id),
                np.asarray(keep_idx), np.asarray(keep_mask), r)

    def postprocess(self, raw, meta=None) -> Detections:
        boxes, score, cls_id, keep_idx, keep_mask, r = raw
        idx = keep_idx[keep_mask]
        return Detections(
            xyxy=boxes[idx] / r,  # undo letterbox scale
            conf=score[idx],
            cls=cls_id[idx],
        )

    def __call__(self, img: np.ndarray) -> Detections:
        batch = self.preprocess(img)
        return self.postprocess(self.process(batch))


def get_detector_class(weights) -> type[BaseDetectorBackend]:
    stem = Path(str(weights)).stem.lower()
    if stem.startswith("yolox"):
        return YoloXDetector
    if stem.startswith("rtdetr") or stem.startswith("rt-detr"):
        return RTDetrDetector
    return UltralyticsDetector


def create_detector(weights, **kwargs) -> BaseDetectorBackend:
    return get_detector_class(weights)(weights=weights, **kwargs)
