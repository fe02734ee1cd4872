"""Vendored minimal YOLO predictor (ultralytics-API-compatible).

The reference runs its ultralytics adapter against the real ultralytics
predictor (boxmot/detectors/ultralytics.py:17,133); that package cannot
be installed in every deployment (and is absent in this build
environment), yet the adapter's three result families — detect boxes,
segment masks, OBB — still need a real model to execute against.

LiteYOLO is a small Flax implementation of the YOLOv8-style anchor-free
predictor family: conv backbone + decoupled head (+ mask prototypes for
`-seg`, + angle channel for `-obb`), device-side decode + NMS, results
returned through the same attribute surface the ultralytics predictor
exposes:

    result.boxes.{xyxy, conf, cls}
    result.masks.data          # (N, H, W) float, input resolution
    result.obb.{xywhr, conf, cls}
    result.keypoints.{data, xy, conf}   # (N, K, 3) / (N, K, 2) / (N, K)

It is NOT a weight-compatible ultralytics port — it exists so the
adapter path is exercised end-to-end by a real forward pass, and as an
offline fallback predictor.  Weight stems ``yololite*`` (optionally
``-seg`` / ``-obb``) route here; weights are seeded deterministically
from the stem, or loaded from a ``.msgpack`` file if one exists at the
given path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

IMGSZ = 256  # square inference size (letterboxed)
STRIDE = 16
N_PROTO = 8
N_KPT = 17  # COCO keypoint schema (what yolov8*-pose emits)


def _build(task: str, nc: int):
    import flax.linen as nn
    import jax.numpy as jnp

    class ConvBNSiLU(nn.Module):
        ch: int
        stride: int = 1

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(self.ch, (3, 3), strides=self.stride, use_bias=False)(x)
            x = nn.LayerNorm()(x)  # stand-in for BN (inference-mode stable)
            return nn.silu(x)

    class LiteNet(nn.Module):
        task: str
        nc: int

        @nn.compact
        def __call__(self, x):
            # backbone: stride 16 feature map
            feats = []
            for ch in (16, 32, 64, 128):
                x = ConvBNSiLU(ch, stride=2)(x)
                feats.append(x)
            f = ConvBNSiLU(128)(x)  # (H/16, W/16, 128)
            # decoupled head
            box = nn.Conv(4, (1, 1))(ConvBNSiLU(64)(f))
            cls = nn.Conv(self.nc, (1, 1))(ConvBNSiLU(64)(f))
            out = {"box": box, "cls": cls}
            if self.task == "obb":
                out["angle"] = nn.Conv(1, (1, 1))(ConvBNSiLU(32)(f))
            if self.task == "segment":
                # prototypes at stride 8 from the matching backbone level
                p = ConvBNSiLU(32)(feats[2])
                out["proto"] = nn.Conv(N_PROTO, (1, 1))(p)  # (H/8, W/8, P)
                out["coef"] = nn.Conv(N_PROTO, (1, 1))(ConvBNSiLU(32)(f))
            if self.task == "pose":
                out["kpt"] = nn.Conv(N_KPT * 3, (1, 1))(ConvBNSiLU(64)(f))
            return out

    return LiteNet(task=task, nc=nc)


class _Boxes:
    def __init__(self, xyxy, conf, cls):
        self.xyxy, self.conf, self.cls = xyxy, conf, cls

    def __len__(self):
        return len(self.conf)


class _Masks:
    def __init__(self, data):
        self.data = data

    def __len__(self):
        return len(self.data)


class _Obb:
    def __init__(self, xywhr, conf, cls):
        self.xywhr, self.conf, self.cls = xywhr, conf, cls

    def __len__(self):
        return len(self.conf)


class _Keypoints:
    """ultralytics ``Keypoints`` surface: data (N,K,3), xy (N,K,2),
    conf (N,K)."""

    def __init__(self, data):
        self.data = data
        self.xy = data[..., :2]
        self.conf = data[..., 2]

    def __len__(self):
        return len(self.data)


class LiteResults:
    """One frame's predictions, ultralytics-Results-shaped."""

    def __init__(self, boxes=None, masks=None, obb=None, keypoints=None,
                 orig_shape=None):
        self.boxes = boxes
        self.masks = masks
        self.obb = obb
        self.keypoints = keypoints
        self.orig_shape = orig_shape


class LiteYOLO:
    """Callable predictor with the ultralytics ``YOLO`` usage surface
    this framework's adapter exercises: ``model.predict(img, conf=...,
    iou=..., classes=..., agnostic_nms=...) -> [LiteResults]``."""

    def __init__(self, weights="yololite.pt", nc: int = 3):
        import jax
        import jax.numpy as jnp

        stem = Path(str(weights)).stem.lower()
        if "-seg" in stem or "_seg" in stem:
            self.task = "segment"
        elif "-obb" in stem or "_obb" in stem:
            self.task = "obb"
        elif "-pose" in stem or "_pose" in stem:
            self.task = "pose"
        else:
            self.task = "detect"
        self.nc = nc
        self.model = _build(self.task, nc)
        seed = int.from_bytes(stem.encode()[:4].ljust(4, b"\0"), "little")
        p = Path(str(weights))
        if p.suffix == ".msgpack" and p.exists():
            import flax.serialization as ser

            template = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((IMGSZ, IMGSZ, 3), jnp.float32)[None]
            )
            self.variables = ser.from_bytes(template, p.read_bytes())
        else:
            self.variables = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((IMGSZ, IMGSZ, 3), jnp.float32)[None],
            )

        model = self.model
        task = self.task
        g = IMGSZ // STRIDE
        gy, gx = jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij")
        grid = jnp.stack([gx.ravel(), gy.ravel()], -1).astype(jnp.float32)
        max_out = 64

        @jax.jit
        def _predict(variables, img, conf_thr, iou_thr, class_mask, agnostic):
            from boxmot_tpu.ops.nms import nms as nms_op

            out = model.apply(variables, img[None])
            box = out["box"][0].reshape(-1, 4)
            logits = out["cls"][0].reshape(-1, model.nc)
            cxy = (jax.nn.sigmoid(box[:, :2]) + grid) * STRIDE
            wh = jnp.exp(jnp.clip(box[:, 2:], -4.0, 4.0)) * STRIDE
            conf = jax.nn.sigmoid(logits)
            cls_id = jnp.argmax(conf, -1)
            score = jnp.max(conf, -1) * class_mask[cls_id]
            xyxy = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
            # class-aware NMS via the coordinate-offset trick unless agnostic
            offset = jnp.where(agnostic, 0.0, cls_id.astype(jnp.float32) * IMGSZ * 2)
            keep_idx, keep_mask = nms_op(
                xyxy + offset[:, None],
                jnp.where(score >= conf_thr, score, -1.0),
                iou_thr,
                max_out,
            )
            res = {
                "xyxy": xyxy[keep_idx],
                "conf": score[keep_idx],
                "cls": cls_id[keep_idx].astype(jnp.float32),
                "mask": keep_mask,
            }
            if task == "obb":
                ang = out["angle"][0].reshape(-1)
                # ultralytics OBB angle convention: radians in [-pi/4, 3pi/4)
                res["angle"] = (jax.nn.sigmoid(ang) - 0.25) * jnp.pi
                res["angle"] = res["angle"][keep_idx]
            if task == "segment":
                coef = out["coef"][0].reshape(-1, N_PROTO)[keep_idx]
                proto = out["proto"][0]  # (H/8, W/8, P)
                m = jax.nn.sigmoid(jnp.einsum("hwp,np->nhw", proto, coef))
                res["masks"] = jax.image.resize(
                    m, (max_out, IMGSZ, IMGSZ), method="bilinear"
                )
            if task == "pose":
                kpt = out["kpt"][0].reshape(-1, N_KPT, 3)
                # anchor-relative decode (yolov8-pose convention: xy may
                # fall up to one cell outside its anchor)
                kxy = (jax.nn.sigmoid(kpt[..., :2]) * 4.0 - 1.5) * STRIDE
                kxy = kxy + grid[:, None, :] * STRIDE
                kconf = jax.nn.sigmoid(kpt[..., 2])
                res["kpts"] = jnp.concatenate(
                    [kxy, kconf[..., None]], -1
                )[keep_idx]  # (max_out, K, 3)
            return res

        self._program = _predict

    def predict(self, source, conf=0.25, iou=0.7, classes=None,
                agnostic_nms=False, verbose=False, **kwargs):
        import jax.numpy as jnp

        imgs = source if isinstance(source, (list, tuple)) else [source]
        out = []
        for img in imgs:
            h0, w0 = img.shape[:2]
            r = IMGSZ / max(h0, w0)
            import cv2

            resized = cv2.resize(img, (int(w0 * r), int(h0 * r)))
            padded = np.full((IMGSZ, IMGSZ, 3), 114, np.uint8)
            padded[: resized.shape[0], : resized.shape[1]] = resized
            class_mask = np.ones((self.nc,), np.float32)
            if classes is not None:
                class_mask[:] = 0.0
                class_mask[np.asarray(classes, int)] = 1.0
            res = self._program(
                self.variables,
                jnp.asarray(padded, jnp.float32) / 255.0,
                float(conf),
                float(iou),
                jnp.asarray(class_mask),
                bool(agnostic_nms),
            )
            keep = np.asarray(res["mask"]).copy()
            xyxy_all = np.asarray(res["xyxy"]) / r
            xyxy_all[:, 0::2] = xyxy_all[:, 0::2].clip(0, w0)
            xyxy_all[:, 1::2] = xyxy_all[:, 1::2].clip(0, h0)
            # boxes fully outside the frame collapse to zero-area slivers
            # on the border when clipped; drop them (ultralytics' predictor
            # never emits degenerate boxes downstream)
            keep &= (xyxy_all[:, 2] - xyxy_all[:, 0] > 1.0) & (
                xyxy_all[:, 3] - xyxy_all[:, 1] > 1.0
            )
            xyxy = xyxy_all[keep]
            score = np.asarray(res["conf"])[keep]
            cls = np.asarray(res["cls"])[keep]
            result = LiteResults(orig_shape=(h0, w0))
            if self.task == "obb":
                cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
                cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
                w = xyxy[:, 2] - xyxy[:, 0]
                hh = xyxy[:, 3] - xyxy[:, 1]
                ang = np.asarray(res["angle"])[keep]
                xywhr = np.stack([cx, cy, w, hh, ang], -1).astype(np.float32)
                result.obb = _Obb(xywhr, score, cls)
                result.boxes = _Boxes(xyxy, score, cls)
            else:
                result.boxes = _Boxes(xyxy, score, cls)
                if self.task == "pose":
                    k = np.asarray(res["kpts"])[keep]
                    k[..., :2] /= r
                    k[..., 0] = k[..., 0].clip(0, w0)
                    k[..., 1] = k[..., 1].clip(0, h0)
                    result.keypoints = _Keypoints(k.astype(np.float32))
                if self.task == "segment":
                    n = int(keep.sum())
                    m = np.asarray(res["masks"])[keep]
                    # un-letterbox to the original frame resolution
                    mh, mw = int(IMGSZ * h0 / max(h0, w0)), int(IMGSZ * w0 / max(h0, w0))
                    m = m[:, :mh, :mw]
                    if n:
                        import cv2

                        m = np.stack(
                            [cv2.resize(mi, (w0, h0)) for mi in m], 0
                        )
                    else:
                        m = np.zeros((0, h0, w0), np.float32)
                    result.masks = _Masks(m)
            out.append(result)
        return out

    __call__ = predict
