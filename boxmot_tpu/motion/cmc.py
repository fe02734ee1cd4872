"""Camera-motion compensation, TPU-native.

The reference estimates camera motion with OpenCV (ECC / ORB / SIFT /
sparse optical flow, boxmot/motion/cmc/*.py).  Here the default ECC
method (cv2.findTransformECC with MOTION_TRANSLATION or
MOTION_EUCLIDEAN on downscaled grayscale, ecc.py:14-100) is implemented
directly in JAX as a fixed-iteration Gauss-Newton loop on the Enhanced
Correlation Coefficient criterion (Evangelidis & Psarakis, PAMI 2008) —
the same estimator, but jittable, so it can run on device and inside
replay scans.

Conventions match the reference: the returned 2x3 warp maps previous
frame coordinates to current-frame coordinates, and the translation is
rescaled to full resolution when estimation runs on a downscaled image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BGR_GRAY = (0.114, 0.587, 0.299)  # cv2 BGR2GRAY weights


def to_gray(img, bgr: bool = True):
    w = jnp.asarray(BGR_GRAY if bgr else BGR_GRAY[::-1], jnp.float32)
    return jnp.tensordot(img.astype(jnp.float32), w, axes=([-1], [0]))


def downscale(gray, out_hw):
    return jax.image.resize(gray, out_hw, method="linear")


def _sample(img, ys, xs):
    H, W = img.shape
    ys = jnp.clip(ys, 0.0, H - 1.001)
    xs = jnp.clip(xs, 0.0, W - 1.001)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    wy = ys - y0
    wx = xs - x0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


@functools.partial(jax.jit, static_argnames=("n_iters", "mode"))
def ecc_align(prev, curr, n_iters: int = 50, mode: str = "translation"):
    """Estimate the warp aligning prev -> curr on equal-shape grayscale
    images.  Returns a (2, 3) affine matrix.

    mode: "translation" (2 params, the reference default) or
    "euclidean" (rotation + translation).
    """
    H, W = prev.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    # template (prev), zero-mean; border pixels excluded like cv2's window
    tpl = prev.astype(jnp.float32)
    tpl_zm = tpl - jnp.mean(tpl)

    # gradients of the current image (central differences)
    cf = curr.astype(jnp.float32)
    gx = jnp.zeros_like(cf).at[:, 1:-1].set((cf[:, 2:] - cf[:, :-2]) / 2.0)
    gy = jnp.zeros_like(cf).at[1:-1, :].set((cf[2:, :] - cf[:-2, :]) / 2.0)

    n_params = 2 if mode == "translation" else 3

    def warp_grid(p):
        if mode == "translation":
            tx, ty = p[0], p[1]
            return ys + ty, xs + tx
        th, tx, ty = p[0], p[1], p[2]
        c, s = jnp.cos(th), jnp.sin(th)
        wxs = c * xs - s * ys + tx
        wys = s * xs + c * ys + ty
        return wys, wxs

    def body(_, p):
        wys, wxs = warp_grid(p)
        iw = _sample(cf, wys, wxs)
        gxw = _sample(gx, wys, wxs)
        gyw = _sample(gy, wys, wxs)

        if mode == "translation":
            J = jnp.stack([gxw.ravel(), gyw.ravel()], axis=1)  # (N, 2)
        else:
            th = p[0]
            c, s = jnp.cos(th), jnp.sin(th)
            dx_dth = -s * xs - c * ys
            dy_dth = c * xs - s * ys
            j_th = gxw * dx_dth + gyw * dy_dth
            J = jnp.stack([j_th.ravel(), gxw.ravel(), gyw.ravel()], axis=1)

        iw_zm = (iw - jnp.mean(iw)).ravel()
        t = tpl_zm.ravel()
        C = J.T @ J + 1e-6 * jnp.eye(n_params)
        Cinv = jnp.linalg.inv(C)
        Gi = J.T @ iw_zm
        Gt = J.T @ t
        num = iw_zm @ iw_zm - Gi @ Cinv @ Gi
        den = t @ iw_zm - Gt @ Cinv @ Gi
        lam = num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        err = lam * t - iw_zm
        dp = Cinv @ (J.T @ err)
        return p + dp

    p = jnp.zeros((n_params,), jnp.float32)
    p = jax.lax.fori_loop(0, n_iters, body, p)

    if mode == "translation":
        warp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        warp = warp.at[0, 2].set(p[0]).at[1, 2].set(p[1])
    else:
        c, s = jnp.cos(p[0]), jnp.sin(p[0])
        warp = jnp.stack(
            [jnp.stack([c, -s, p[1]]), jnp.stack([s, c, p[2]])]
        ).astype(jnp.float32)
    return warp


class ECC:
    """Host-side stateful wrapper mirroring the reference ECC class
    (motion/cmc/ecc.py:14-100): keeps the previous downscaled grayscale
    frame and returns the 2x3 warp for each new frame."""

    def __init__(
        self,
        warp_mode: str = "translation",
        max_iter: int = 50,
        scale: float = 0.15,
        grayscale: bool = True,
        bgr: bool = True,
    ):
        self.mode = warp_mode
        self.max_iter = max_iter
        self.scale = scale
        self.bgr = bgr
        self.prev = None

    def preprocess(self, img: np.ndarray):
        g = to_gray(jnp.asarray(img), bgr=self.bgr) if img.ndim == 3 else jnp.asarray(
            img, jnp.float32
        )
        if self.scale < 1.0:
            hw = (max(int(g.shape[0] * self.scale), 8), max(int(g.shape[1] * self.scale), 8))
            g = downscale(g, hw)
        return g

    def apply(self, img: np.ndarray, dets=None) -> np.ndarray:
        warp = np.eye(2, 3, dtype=np.float32)
        if img is None:
            return warp
        curr = self.preprocess(img)
        if self.prev is None or self.prev.shape != curr.shape:
            self.prev = curr
            return warp
        w = np.asarray(ecc_align(self.prev, curr, self.max_iter, self.mode))
        self.prev = curr
        if self.scale < 1.0:
            w = w.copy()
            w[0, 2] /= self.scale
            w[1, 2] /= self.scale
        return w


class NoCMC:
    def apply(self, img, dets=None):
        return np.eye(2, 3, dtype=np.float32)


class _FeatureCMC:
    """Shared host-side machinery for the keypoint CMC estimators
    (boxmot/motion/cmc/base_cmc.py:31-105): BGR->gray + downscale
    preprocessing, a border + detection mask, and translation upscaling.

    Feature detection/matching is inherently host work (cv2), exactly as
    in the reference; only the warp *application* runs on device inside
    the tracker step.
    """

    scale: float = 0.15

    def _preprocess(self, img):
        import cv2

        out = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) if img.ndim == 3 else img
        if self.scale and self.scale != 1.0:
            out = cv2.resize(
                out, (0, 0), fx=self.scale, fy=self.scale,
                interpolation=cv2.INTER_LINEAR,
            )
        return out

    def _mask(self, img_gray, dets):
        h, w = img_gray.shape[:2]
        mask = np.zeros((h, w), np.uint8)
        mask[int(0.02 * h) : int(0.98 * h), int(0.02 * w) : int(0.98 * w)] = 255
        if dets is None or np.asarray(dets).size == 0:
            return mask
        for det in np.asarray(dets):
            if len(det) < 4:
                continue
            x1, y1, x2, y2 = (np.asarray(det[:4], np.float32) * self.scale).astype(int)
            x1, x2 = max(0, min(w, x1)), max(0, min(w, x2))
            y1, y2 = max(0, min(h, y1)), max(0, min(h, y2))
            if x2 > x1 and y2 > y1:
                mask[y1:y2, x1:x2] = 0
        return mask

    def _upscale(self, H):
        if self.scale < 1.0:
            H = H.copy()
            H[0, 2] /= self.scale
            H[1, 2] /= self.scale
        return H.astype(np.float32)


class _DescriptorCMC(_FeatureCMC):
    """ORB/SIFT common flow (orb.py:46-147, sift.py): detect+describe,
    KNN match with Lowe ratio 0.9, spatial gating at 25% of the frame,
    2.5-sigma outlier rejection, RANSAC partial-affine fit."""

    def __init__(self, scale: float = 0.15):
        self.scale = float(scale)
        self.prev_img = None
        self.prev_keypoints = None
        self.prev_descriptors = None

    def _store(self, img_p, keypoints, descriptors):
        self.prev_img = img_p.copy()
        self.prev_keypoints = keypoints
        self.prev_descriptors = descriptors

    def apply(self, img, dets=None):
        import cv2

        H = np.eye(2, 3, dtype=np.float32)
        img_p = self._preprocess(np.asarray(img))
        h, w = img_p.shape[:2]
        mask = self._mask(img_p, dets)

        keypoints = self.detector.detect(img_p, mask)
        keypoints, descriptors = self.extractor.compute(img_p, keypoints)
        if descriptors is None or len(keypoints) < 4 or self.prev_descriptors is None:
            self._store(img_p, keypoints, descriptors)
            return H

        knn = self.matcher.knnMatch(self.prev_descriptors, descriptors, k=2)
        matches, dxys = [], []
        max_sd = 0.25 * np.array([w, h], np.float32)
        for pair in knn:
            if len(pair) != 2:
                continue
            m, n = pair
            if m.distance >= 0.9 * n.distance:
                continue
            prev_pt = np.array(self.prev_keypoints[m.queryIdx].pt, np.float32)
            curr_pt = np.array(keypoints[m.trainIdx].pt, np.float32)
            dxy = prev_pt - curr_pt
            if abs(dxy[0]) < max_sd[0] and abs(dxy[1]) < max_sd[1]:
                matches.append(m)
                dxys.append(dxy)
        if len(matches) < 4:
            self._store(img_p, keypoints, descriptors)
            return H

        dxys = np.asarray(dxys, np.float32)
        ok = np.all((dxys - dxys.mean(axis=0)) < 2.5 * (dxys.std(axis=0) + 1e-6), axis=1)
        good = [m for m, k in zip(matches, ok) if k]
        if len(good) < 4:
            self._store(img_p, keypoints, descriptors)
            return H

        prev_pts = np.array([self.prev_keypoints[m.queryIdx].pt for m in good], np.float32)
        curr_pts = np.array([keypoints[m.trainIdx].pt for m in good], np.float32)
        H_est, _ = cv2.estimateAffinePartial2D(prev_pts, curr_pts, method=cv2.RANSAC)
        self._store(img_p, keypoints, descriptors)
        if H_est is None:
            return H
        return self._upscale(H_est)


class ORB(_DescriptorCMC):
    """FAST keypoints + ORB descriptors + Hamming BFMatcher (orb.py:14-44)."""

    def __init__(self, feature_detector_threshold: int = 20, scale: float = 0.15, **kw):
        import cv2

        super().__init__(scale=scale)
        self.detector = cv2.FastFeatureDetector_create(
            threshold=int(feature_detector_threshold)
        )
        self.extractor = cv2.ORB_create()
        self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING)


class SIFT(_DescriptorCMC):
    """SIFT keypoints/descriptors + L2 BFMatcher (sift.py:27-40).

    Note: the reference's contrastThreshold=0.5 (vs the cv2 default 0.04)
    detects zero keypoints on typical MOT footage at 0.15 scale, so this
    estimator usually returns the identity warp — replicated verbatim for
    parity.  Pass contrast_threshold=0.04 for a working SIFT CMC."""

    def __init__(self, scale: float = 0.15, contrast_threshold: float = 0.5, **kw):
        import cv2

        super().__init__(scale=scale)
        sift = lambda: cv2.SIFT_create(
            nOctaveLayers=2, contrastThreshold=contrast_threshold, edgeThreshold=10
        )
        self.detector = sift()
        self.extractor = sift()
        self.matcher = cv2.BFMatcher(cv2.NORM_L2)


class SOF(_FeatureCMC):
    """Sparse optical flow: goodFeaturesToTrack + pyramidal LK + RANSAC
    partial affine, with inlier-count/ratio rejection (sof.py:14-147).

    Runs on OpenCV when available; hermetic hosts fall back to the
    self-contained numpy pipeline (_np_shi_tomasi / _np_pyr_lk /
    _np_similarity_ransac) with the same stage structure and gates.
    """

    def __init__(
        self,
        scale: float = 0.15,
        min_inliers: int = 8,
        min_inlier_ratio: float = 0.2,
        ransac_reproj_threshold: float = 3.0,
        **kw,
    ):
        import importlib.util

        self._has_cv2 = importlib.util.find_spec("cv2") is not None
        self.scale = float(scale)
        self.min_inliers = int(min_inliers)
        self.min_inlier_ratio = float(min_inlier_ratio)
        self.ransac_reproj_threshold = float(ransac_reproj_threshold)
        self.feature_params = dict(
            maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3,
            useHarrisDetector=False, k=0.04,
        )
        if self._has_cv2:
            import cv2

            self.lk_params = dict(
                winSize=(21, 21), maxLevel=3,
                criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
            )
        self.prev_frame = None
        self.prev_keypoints = None
        self.initialized = False

    def _detect(self, frame_gray, dets):
        import cv2

        return cv2.goodFeaturesToTrack(
            frame_gray, mask=self._mask(frame_gray, dets), **self.feature_params
        )

    def _reset(self, frame_gray, dets=None):
        kps = self._detect(frame_gray, dets)
        self.prev_frame = frame_gray.copy()
        self.prev_keypoints = kps
        self.initialized = kps is not None and len(kps) >= 4

    def apply(self, img, dets=None):
        if not self._has_cv2:
            return self._apply_np(img, dets)
        import cv2

        frame_gray = self._preprocess(np.asarray(img))
        H = np.eye(2, 3, dtype=np.float32)

        if not self.initialized or self.prev_keypoints is None:
            kps = self._detect(frame_gray, dets)
            if kps is None or len(kps) < 4:
                self.prev_frame = frame_gray.copy()
                self.prev_keypoints = kps
                self.initialized = False
                return H
            term = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01)
            cv2.cornerSubPix(frame_gray, kps, (5, 5), (-1, -1), term)
            self.prev_frame = frame_gray.copy()
            self.prev_keypoints = kps.copy()
            self.initialized = True
            return H

        next_kps, status, _ = cv2.calcOpticalFlowPyrLK(
            self.prev_frame, frame_gray, self.prev_keypoints, None, **self.lk_params
        )
        if next_kps is None or status is None:
            self._reset(frame_gray, dets)
            return H
        status = status.reshape(-1)
        prev_valid = self.prev_keypoints[status == 1]
        next_valid = next_kps[status == 1]
        if len(prev_valid) < 4:
            self._reset(frame_gray, dets)
            return H

        H_est, inliers = cv2.estimateAffinePartial2D(
            prev_valid, next_valid, method=cv2.RANSAC,
            ransacReprojThreshold=self.ransac_reproj_threshold,
        )
        n_in = 0 if inliers is None else int(np.count_nonzero(inliers))
        if (
            H_est is None
            or n_in < self.min_inliers
            or n_in / max(len(prev_valid), 1) < self.min_inlier_ratio
        ):
            H_est = H
        else:
            H_est = self._upscale(H_est)

        new_kps = self._detect(frame_gray, dets)
        if new_kps is None or len(new_kps) < 4:
            new_kps = next_valid
        self.prev_frame = frame_gray.copy()
        self.prev_keypoints = new_kps.copy()
        self.initialized = True
        return H_est

    # -- cv2-free path --------------------------------------------------

    def _detect_np(self, frame_gray, dets):
        fp = self.feature_params
        return _np_shi_tomasi(
            frame_gray,
            mask=self._mask(frame_gray, dets),
            max_corners=fp["maxCorners"],
            quality=fp["qualityLevel"],
            min_distance=fp["minDistance"],
            block=fp["blockSize"],
        )

    def _apply_np(self, img, dets=None):
        frame_gray = _np_gray(img, self.scale)
        H = np.eye(2, 3, dtype=np.float32)

        if not self.initialized or self.prev_keypoints is None or len(self.prev_keypoints) < 4:
            kps = self._detect_np(frame_gray, dets)
            self.prev_frame = frame_gray
            self.prev_keypoints = kps
            self.initialized = len(kps) >= 4
            return H

        next_kps, status = _np_pyr_lk(self.prev_frame, frame_gray, self.prev_keypoints)
        prev_valid = self.prev_keypoints[status]
        next_valid = next_kps[status]
        if len(prev_valid) < 4:
            kps = self._detect_np(frame_gray, dets)
            self.prev_frame = frame_gray
            self.prev_keypoints = kps
            self.initialized = len(kps) >= 4
            return H

        H_est, inliers = _np_similarity_ransac(
            prev_valid, next_valid, thresh=self.ransac_reproj_threshold
        )
        n_in = int(np.count_nonzero(inliers))
        if (
            H_est is None
            or n_in < self.min_inliers
            or n_in / max(len(prev_valid), 1) < self.min_inlier_ratio
        ):
            H_est = H
        else:
            H_est = self._upscale(H_est)

        new_kps = self._detect_np(frame_gray, dets)
        if len(new_kps) < 4:
            new_kps = next_valid
        self.prev_frame = frame_gray
        self.prev_keypoints = new_kps
        self.initialized = True
        return H_est


# ---------------------------------------------------------------------------
# cv2-free sparse-optical-flow machinery (used by SOF when OpenCV is
# unavailable — hermetic TPU hosts).  Same structure as the cv2 path:
# Shi-Tomasi corners + pyramidal Lucas-Kanade + RANSAC similarity fit.
# ---------------------------------------------------------------------------


def _np_gray(img, scale):
    """BGR (or gray) image -> float32 grayscale, bilinearly downscaled
    with cv2-style half-pixel centers."""
    img = np.asarray(img)
    g = (
        img.astype(np.float32) @ np.asarray(BGR_GRAY, np.float32)
        if img.ndim == 3
        else img.astype(np.float32)
    )
    if not scale or scale == 1.0:
        return g
    H, W = g.shape
    oh, ow = max(int(H * scale), 8), max(int(W * scale), 8)
    ys = np.clip((np.arange(oh) + 0.5) * (H / oh) - 0.5, 0, H - 1.001)
    xs = np.clip((np.arange(ow) + 0.5) * (W / ow) - 0.5, 0, W - 1.001)
    y0 = ys.astype(np.int32)
    x0 = xs.astype(np.int32)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    return (
        g[y0][:, x0] * (1 - wy) * (1 - wx)
        + g[y0][:, x0 + 1] * (1 - wy) * wx
        + g[y0 + 1][:, x0] * wy * (1 - wx)
        + g[y0 + 1][:, x0 + 1] * wy * wx
    )


def _np_shi_tomasi(gray, mask=None, max_corners=1000, quality=0.01, min_distance=1,
                   block=3):
    """goodFeaturesToTrack equivalent: min-eigenvalue corner response,
    quality-relative threshold, distance-based non-max suppression."""
    from scipy.ndimage import maximum_filter, uniform_filter

    Iy, Ix = np.gradient(gray.astype(np.float32))
    xx = uniform_filter(Ix * Ix, block)
    yy = uniform_filter(Iy * Iy, block)
    xy = uniform_filter(Ix * Iy, block)
    # min eigenvalue of the structure tensor
    tr = xx + yy
    det = np.sqrt(np.maximum((xx - yy) ** 2 + 4 * xy**2, 0.0))
    r = (tr - det) / 2.0
    if mask is not None:
        r = np.where(mask > 0, r, 0.0)
    peak = r.max()
    if peak <= 0:
        return np.empty((0, 2), np.float32)
    size = 2 * max(int(min_distance), 1) + 1
    is_peak = (r == maximum_filter(r, size=size)) & (r >= quality * peak)
    ys, xs = np.nonzero(is_peak)
    order = np.argsort(r[ys, xs])[::-1][:max_corners]
    return np.stack([xs[order], ys[order]], axis=-1).astype(np.float32)


def _np_pyramid(gray, levels):
    pyr = [gray.astype(np.float32)]
    for _ in range(levels):
        g = pyr[-1]
        h2, w2 = g.shape[0] // 2, g.shape[1] // 2
        if h2 < 8 or w2 < 8:
            break
        pyr.append(g[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3)))
    return pyr


def _np_sample_patches(img, cx, cy, half):
    """Bilinear (2*half+1)^2 patches around each (cx, cy) with border
    clamp, batched: cx/cy (N,) -> (N, win, win)."""
    H, W = img.shape
    offs = np.arange(-half, half + 1, dtype=np.float32)
    ys = np.clip(cy[:, None] + offs[None, :], 0, H - 1.001)  # (N, win)
    xs = np.clip(cx[:, None] + offs[None, :], 0, W - 1.001)
    y0 = ys.astype(np.int32)[:, :, None]  # (N, win, 1)
    x0 = xs.astype(np.int32)[:, None, :]  # (N, 1, win)
    wy = (ys - y0[..., 0])[:, :, None]
    wx = (xs - x0[:, 0, :])[:, None, :]
    return (
        img[y0, x0] * (1 - wy) * (1 - wx)
        + img[y0, x0 + 1] * (1 - wy) * wx
        + img[y0 + 1, x0] * wy * (1 - wx)
        + img[y0 + 1, x0 + 1] * wy * wx
    )


def _np_pyr_lk(prev, curr, pts, win=21, levels=3, iters=30, eps=0.01):
    """calcOpticalFlowPyrLK equivalent, vectorized over points.
    pts: (N, 2) xy.  Returns (next_pts, status)."""
    half = win // 2
    prev_pyr = _np_pyramid(prev, levels)
    curr_pyr = _np_pyramid(curr, levels)
    n = len(pts)
    flow = np.zeros((n, 2), np.float32)
    status = np.ones((n,), bool)
    for lvl in range(len(prev_pyr) - 1, -1, -1):
        p = prev_pyr[lvl]
        c = curr_pyr[lvl]
        s = 1.0 / (2**lvl)
        cx = pts[:, 0] * s
        cy = pts[:, 1] * s
        tpl = _np_sample_patches(p, cx, cy, half)  # (N, win, win)
        gy, gx = np.gradient(tpl, axis=(1, 2))
        axx = np.sum(gx * gx, axis=(1, 2))
        axy = np.sum(gx * gy, axis=(1, 2))
        ayy = np.sum(gy * gy, axis=(1, 2))
        det = axx * ayy - axy * axy
        ok = det > 1e-6
        status &= ok
        det = np.where(ok, det, 1.0)
        active = status.copy()
        for _ in range(iters):
            if not active.any():
                break
            patch = _np_sample_patches(c, cx + flow[:, 0], cy + flow[:, 1], half)
            diff = tpl - patch
            bx = np.sum(gx * diff, axis=(1, 2))
            by = np.sum(gy * diff, axis=(1, 2))
            dx = (ayy * bx - axy * by) / det
            dy = (axx * by - axy * bx) / det
            step = active.astype(np.float32)
            flow[:, 0] += dx * step
            flow[:, 1] += dy * step
            active &= (np.abs(dx) >= eps) | (np.abs(dy) >= eps)
        if lvl > 0:
            flow *= 2.0
    nxt = pts + flow
    H, W = curr.shape
    status &= (nxt[:, 0] >= 0) & (nxt[:, 0] < W) & (nxt[:, 1] >= 0) & (nxt[:, 1] < H)
    return nxt, status


def _np_similarity_ransac(src, dst, thresh=3.0, iters=100, seed=0):
    """estimateAffinePartial2D equivalent: RANSAC over 2-point similarity
    hypotheses + least-squares refinement on the consensus set.  Returns
    (2x3 warp or None, inlier mask)."""
    n = len(src)
    if n < 2:
        return None, np.zeros((n,), bool)

    def fit(s, d):
        # complex least squares: d ~ (a + ib) s + (tx + i ty)
        zs = s[:, 0] + 1j * s[:, 1]
        zd = d[:, 0] + 1j * d[:, 1]
        zm = zs.mean()
        dm = zd.mean()
        num = np.vdot(zs - zm, zd - dm)
        den = np.vdot(zs - zm, zs - zm).real
        ab = num / max(den, 1e-12)
        t = dm - ab * zm
        return np.array(
            [[ab.real, -ab.imag, t.real], [ab.imag, ab.real, t.imag]], np.float32
        )

    def residual(M):
        pred = src @ M[:, :2].T + M[:, 2]
        return np.linalg.norm(pred - dst, axis=1)

    rng = np.random.default_rng(seed)
    best_inl = np.zeros((n,), bool)
    for _ in range(iters):
        idx = rng.choice(n, 2, replace=False)
        if np.allclose(src[idx[0]], src[idx[1]]):
            continue
        M = fit(src[idx], dst[idx])
        inl = residual(M) < thresh
        if inl.sum() > best_inl.sum():
            best_inl = inl
    if best_inl.sum() < 2:
        return None, best_inl
    M = fit(src[best_inl], dst[best_inl])
    best_inl = residual(M) < thresh
    return M, best_inl


_CMC_REGISTRY = {
    "ecc": ECC,
    "orb": ORB,
    "sift": SIFT,
    "sof": SOF,
    "none": NoCMC,
}


def get_cmc_method(name):
    if name is None:
        return None
    key = name.strip().lower().replace("-", "_")
    if key not in _CMC_REGISTRY:
        raise ValueError(
            f"Unknown cmc_method={name!r}. Supported: {sorted(_CMC_REGISTRY)}"
        )
    return _CMC_REGISTRY[key]


def create_cmc(name, **kwargs):
    cls = get_cmc_method(name)
    return None if cls is None else cls(**kwargs)
