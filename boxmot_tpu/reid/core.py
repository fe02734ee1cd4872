"""ReID facade: crops -> embeddings, all on device.

API mirror of the reference ReID facade (boxmot/reid/core/reid.py:26-262
and backends/base_backend.py:19-260): `ReID(weights, ...)` exposes
`get_features(xyxys, img) -> (N, F) L2-normalized embeddings`.  Instead
of suffix-dispatched runtime backends (.pt/.onnx/.engine/...), there is
one TPU path: device crop+resize+standardize (ops/crops.py) feeding a
jitted Flax backbone; detection counts are padded to static buckets.

Model names follow the reference MODEL_FACTORY naming
(boxmot/reid/core/factory.py:27-63); weight files are torchreid-format
checkpoints converted on load (models/convert.py).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from boxmot_tpu.models import convert as convert_mod
from boxmot_tpu.models.backbones import (
    build_mobilenetv2,
    build_resnet50,
    build_resnet101,
)
from boxmot_tpu.models.csl_tinyvit import build_csl_tinyvit
from boxmot_tpu.models.clip_reid import build_clip_reid
from boxmot_tpu.models.cspreid import build_cspreid
from boxmot_tpu.models.hacnn import build_hacnn
from boxmot_tpu.models.lmbn import build_lmbn
from boxmot_tpu.models.mlfn import build_mlfn
from boxmot_tpu.models.osnet import OSNET_VARIANTS, build_osnet
from boxmot_tpu.models.vit import build_vit
from boxmot_tpu.ops.crops import extract_crops

CROP_BUCKETS = (1, 8, 16, 32, 64, 128, 256)

CSL_VARIANTS = (
    "csl_tinyvit_7m",
    "csl_tinyvit_7m_lmbn",
    "csl_tinyvit_11m",
    "csl_tinyvit_11m_lmbn",
    "csl_tinyvit_23m",
    "csl_tinyvit_23m_lmbn",
    "csl_tinyvit_small",
    "csl_tinyvit_normal",
    "csl_tinyvit_large",
    "csl_tinyvit_lmbn",
)

VIT_VARIANTS = (
    "vit_nano",
    "vit_nano_ain",
    "vit_nano_ain_os",
    "vit_tiny",
    "vit_tiny_parts",
    "vit_tiny_parts3",
)

MODEL_FACTORY = {name: partial(build_osnet, name) for name in OSNET_VARIANTS}
MODEL_FACTORY.update({name: partial(build_vit, name) for name in VIT_VARIANTS})
MODEL_FACTORY.update(
    {name: partial(build_csl_tinyvit, name) for name in CSL_VARIANTS}
)
MODEL_FACTORY.update(
    {
        "lmbn_n": partial(build_lmbn, "lmbn_n"),
        "lmbn_ain_n": partial(build_lmbn, "lmbn_ain_n"),
        "cspreid_n": build_cspreid,
        "mlfn": build_mlfn,
        "hacnn": build_hacnn,
        "clip": build_clip_reid,
    }
)
MODEL_FACTORY.update(
    {
        "resnet50": build_resnet50,
        "resnet101": build_resnet101,
        "mobilenetv2_x1_0": build_mobilenetv2,
        "mobilenetv2_x1_4": partial(build_mobilenetv2, width=1.4),
        "mobilenetv2": build_mobilenetv2,
    }
)


def infer_model_name(weights: str | Path | None) -> str:
    """Guess the backbone from the weights filename (reference
    registry.get_model_name semantics, registry.py:126-214)."""
    if weights is None:
        return "osnet_x0_25"
    stem = Path(weights).stem.lower()
    for name in sorted(MODEL_FACTORY, key=len, reverse=True):
        if name in stem:
            return name
    raise ValueError(f"cannot infer ReID model from weights name {weights!r}")


def _crop_bucket(n: int) -> int:
    for b in CROP_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"too many crops: {n}")


class ReID:
    """Appearance model with the reference get_features contract."""

    def __init__(
        self,
        weights: str | Path | None = None,
        device=None,  # accepted for API parity; jax picks the backend
        half: bool = False,
        preprocess_name: str = "resize",
        model_name: str | None = None,
        crop_hw: tuple[int, int] = (256, 128),
    ):
        self.model_name = model_name or infer_model_name(weights)
        self.model = MODEL_FACTORY[self.model_name]()
        self.crop_hw = crop_hw
        self.half = half
        self.preprocess_name = preprocess_name
        self.feature_dim = self.model.feature_dim

        if (
            weights is not None
            and str(weights).endswith(".msgpack")
            and Path(str(weights)).exists()
        ):
            # native flax checkpoint (reid/exporters.py export_checkpoint)
            from boxmot_tpu.reid.exporters import load_checkpoint

            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, *crop_hw, 3), jnp.float32)
            template = self.model.init(rng, dummy)
            self.variables = load_checkpoint(template, str(weights))
        elif weights is not None and Path(str(weights)).exists():
            self.variables = convert_mod.convert_checkpoint(
                str(weights), self.model_name
            )
        else:
            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, *crop_hw, 3), jnp.float32)
            self.variables = self.model.init(rng, dummy)
        if half:
            self.variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.asarray(x).dtype == jnp.float32
                else x,
                self.variables,
            )

        model = self.model
        crop = crop_hw

        from functools import partial

        @partial(jax.jit, static_argnames=("is_obb",))
        def _forward(variables, img_bgr, boxes, valid, is_obb=False):
            # BGR->RGB on device (reference flips on host, base_backend.py:181)
            img_rgb = img_bgr[..., ::-1]
            crops = extract_crops(img_rgb, boxes, out_hw=crop, is_obb=is_obb)
            if half:
                crops = crops.astype(jnp.bfloat16)
            feats = model.apply(variables, crops)
            feats = feats.astype(jnp.float32)
            norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
            feats = feats / jnp.maximum(norm, 1e-12)
            return jnp.where(valid[:, None], feats, 0.0)

        self._forward = _forward

        @partial(jax.jit, static_argnames=("is_obb",))
        def _forward_multi(variables, imgs_bgr, boxes, valid, is_obb=False):
            # (G, H, W, 3) frames, (G, B, 4|5) boxes, (G, B) valid:
            # crops from every frame share ONE backbone forward, so
            # sparse scenes (10-30 dets/frame) run at the batch size the
            # MXU wants and the per-call dispatch/transfer overhead is
            # amortized G-fold (docs/artifacts/reid_roofline.md).
            def crops_of(img, bx):
                return extract_crops(
                    img[..., ::-1], bx, out_hw=crop, is_obb=is_obb
                )

            crops = jax.vmap(crops_of)(imgs_bgr, boxes)  # (G, B, h, w, 3)
            G, B = crops.shape[0], crops.shape[1]
            flat = crops.reshape((G * B, *crops.shape[2:]))
            if half:
                flat = flat.astype(jnp.bfloat16)
            feats = model.apply(variables, flat).astype(jnp.float32)
            feats = feats / jnp.maximum(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
            )
            feats = feats.reshape((G, B, -1))
            return jnp.where(valid[..., None], feats, 0.0)

        self._forward_multi = _forward_multi

    def get_features_multi(self, boxes_per_frame, imgs):
        """Embeddings for several frames in ONE device program.

        Args:
            boxes_per_frame: list of (Ni, 4) xyxy (or (Ni, 5) xywha)
                arrays, one per frame.
            imgs: list of same-shape HxWx3 uint8 frames.

        Returns a list of (Ni, F) float32 arrays.  Per-crop math is
        identical to :meth:`get_features`; only the batch packing
        differs.
        """
        assert len(boxes_per_frame) == len(imgs)
        G = len(imgs)
        if G == 0:
            return []
        if G == 1:
            return [self.get_features(boxes_per_frame[0], imgs[0])]
        arrs = []
        for b in boxes_per_frame:
            a = np.asarray(b, np.float32)
            arrs.append(a.reshape(0, 4) if a.size == 0 else a.reshape(len(a), -1))
        cols = max((a.shape[1] for a in arrs if a.size), default=4)
        cols = 5 if cols >= 5 else 4
        is_obb = cols == 5
        n_max = max((len(a) for a in arrs), default=0)
        if n_max == 0:
            return [np.zeros((0, self.feature_dim), np.float32) for _ in arrs]
        B = _crop_bucket(min(n_max, CROP_BUCKETS[-1]))
        if n_max > CROP_BUCKETS[-1]:
            # oversized frames fall back to the single-frame chunker
            return [self.get_features(b, i) for b, i in zip(boxes_per_frame, imgs)]
        boxes = np.zeros((G, B, cols), np.float32)
        boxes[:, :, 2:4] = 1.0
        valid = np.zeros((G, B), bool)
        for g, a in enumerate(arrs):
            c = min(cols, a.shape[1]) if a.size else cols
            boxes[g, : len(a), :c] = a[:, :c]
            valid[g, : len(a)] = True
        feats = self._forward_multi(
            self.variables,
            jnp.asarray(np.stack(imgs)),
            jnp.asarray(boxes),
            jnp.asarray(valid),
            is_obb=is_obb,
        )
        out = np.asarray(feats)
        return [out[g, : len(a)] for g, a in enumerate(arrs)]

    def get_features(self, xyxys: np.ndarray, img: np.ndarray) -> np.ndarray:
        """(N, 4) xyxy or (N, 5) xywha boxes + HxWx3 uint8 frame ->
        (N, F) embeddings.  Rotated boxes yield rotation-rectified crops
        (the reference backend crops layout.boxes, botsort.py:190-192).
        """
        xyxys = np.asarray(xyxys, np.float32)
        is_obb = xyxys.ndim == 2 and xyxys.shape[1] >= 5
        cols = 5 if is_obb else 4
        xyxys = xyxys.reshape(-1, cols) if xyxys.ndim != 2 else xyxys[:, :cols]
        n = len(xyxys)
        if n == 0:
            return np.zeros((0, self.feature_dim), np.float32)
        if n > CROP_BUCKETS[-1]:
            # chunk oversized crop batches instead of erroring (the
            # reference autotunes batch size, inference.py:372-388)
            step = CROP_BUCKETS[-1]
            return np.concatenate(
                [self.get_features(xyxys[i : i + step], img) for i in range(0, n, step)]
            )
        B = _crop_bucket(n)
        boxes = np.zeros((B, cols), np.float32)
        boxes[:, 2:4] = 1.0  # unit padding boxes keep the grid finite
        boxes[:n] = xyxys
        valid = np.arange(B) < n
        feats = self._forward(
            self.variables,
            jnp.asarray(img),
            jnp.asarray(boxes),
            jnp.asarray(valid),
            is_obb=is_obb,
        )
        return np.asarray(feats)[:n]

    def __call__(self, xyxys, img):
        return self.get_features(xyxys, img)
