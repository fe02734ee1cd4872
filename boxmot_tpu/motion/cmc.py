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


_CMC_REGISTRY = {
    "ecc": ECC,
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
