"""Detector registry: name -> backend class by filename heuristics.

Mirror of boxmot/detectors/registry.py:41-132: yolox_* weights map to
the YOLOX backend, rtdetr_* to the HF-transformers RT-DETR pipeline,
anything else to the ultralytics adapter.  Backends whose runtime
dependency or weights are unavailable raise a clear error at
construction, not at import.
"""

from __future__ import annotations

from pathlib import Path

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


class UltralyticsDetector(BaseDetectorBackend):
    """Adapter over the ultralytics YOLO predictor (detectors/ultralytics.py)."""

    def __init__(self, weights, device=None, half=False, conf=0.25, **kwargs):
        super().__init__(weights, device, half)
        try:
            from ultralytics import YOLO  # noqa: PLC0415
        except ImportError as exc:
            raise ImportError(
                "ultralytics is not installed in this environment; install it "
                "or use cached detections (generate/eval --detector public)"
            ) from exc
        self.model = YOLO(str(weights))
        self.conf = conf

    def preprocess(self, img):
        return img, None

    def process(self, batch):
        return self.model.predict(batch, conf=self.conf, verbose=False)[0]

    def postprocess(self, raw, meta) -> Detections:
        import numpy as np

        boxes = raw.boxes
        return Detections(
            xyxy=np.asarray(boxes.xyxy),
            conf=np.asarray(boxes.conf),
            cls=np.asarray(boxes.cls),
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
    """YOLOX backend: raw-head decode + NMS run as JAX ops
    (ops/nms.py yolox_decode + batched_class_nms).  The backbone forward
    requires converted weights; construction without them raises."""

    def __init__(self, weights, **kwargs):
        super().__init__(weights, **kwargs)
        raise NotImplementedError(
            "The YOLOX backbone port lands with converted weights; use cached "
            "detections meanwhile. Decode/NMS device ops are available in "
            "boxmot_tpu.ops.nms."
        )


def get_detector_class(weights) -> type[BaseDetectorBackend]:
    stem = Path(str(weights)).stem.lower()
    if stem.startswith("yolox"):
        return YoloXDetector
    if stem.startswith("rtdetr") or stem.startswith("rt-detr"):
        return RTDetrDetector
    return UltralyticsDetector


def create_detector(weights, **kwargs) -> BaseDetectorBackend:
    return get_detector_class(weights)(weights=weights, **kwargs)
