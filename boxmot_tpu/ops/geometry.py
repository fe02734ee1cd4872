"""Box geometry conversions as pure JAX functions.

Semantics mirror the reference conversions in
boxmot/trackers/common/geometry.py:10-125 but are written as pure,
jit/vmap-friendly functions over the last axis (no in-place mutation).
All functions accept (..., 4) arrays and return (..., 4) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def xyxy2xywh(x):
    """(x1,y1,x2,y2) -> (cx,cy,w,h)."""
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(x):
    """(cx,cy,w,h) -> (x1,y1,x2,y2)."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xywh2tlwh(x):
    """(cx,cy,w,h) -> (t,l,w,h) top-left corner + size."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2.0, cy - h / 2.0, w, h], axis=-1)


def tlwh2xyxy(x):
    t, l, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([t, l, t + w, l + h], axis=-1)


def xyxy2tlwh(x):
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def tlwh2xyah(x):
    """(t,l,w,h) -> (cx,cy,aspect=w/h,h)."""
    t, l, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([t + w / 2, l + h / 2, w / h, h], axis=-1)


def xyxy2xyah(x):
    """(x1,y1,x2,y2) -> (cx,cy,a,h). Composition used by ByteTrack STrack init."""
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    w = x2 - x1
    h = y2 - y1
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, w / h, h], axis=-1)


def xyah2xyxy(x):
    """(cx,cy,a,h) -> (x1,y1,x2,y2); a = w/h (STrack.xyxy, bytetrack.py:175-186)."""
    cx, cy, a, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    w = a * h
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xysr(x):
    """(x1,y1,x2,y2) -> (cx,cy,s=area,r=w/(h+1e-6)) — OC-SORT measurement space
    (geometry.py:103-125)."""
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    w = x2 - x1
    h = y2 - y1
    return jnp.stack([x1 + w / 2.0, y1 + h / 2.0, w * h, w / (h + 1e-6)], axis=-1)


def xysr2xyxy(x):
    """(cx,cy,s,r) -> (x1,y1,x2,y2); w = sqrt(s*r), h = s/w (OC-SORT
    convert_x_to_bbox semantics)."""
    cx, cy, s, r = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    w = jnp.sqrt(jnp.maximum(s * r, 0.0))
    h = s / jnp.maximum(w, 1e-12)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def obb2xysr(b):
    """(cx,cy,w,h,theta) -> (cx,cy,s=w*h,r=w/h,theta) — OC-SORT OBB
    measurement space (convert_obb_to_z, ocsort.py:49-60)."""
    w = jnp.maximum(b[..., 2], 1e-6)
    h = jnp.maximum(b[..., 3], 1e-6)
    return jnp.stack(
        [b[..., 0], b[..., 1], w * h, w / h, b[..., 4]], axis=-1
    )


def xysr2obb(x):
    """(cx,cy,s,r,theta,...) state -> (cx,cy,w,h,theta)
    (convert_x_to_obb, ocsort.py:62-72)."""
    w = jnp.sqrt(jnp.maximum(x[..., 2] * x[..., 3], 1e-12))
    h = x[..., 2] / jnp.maximum(w, 1e-6)
    return jnp.stack([x[..., 0], x[..., 1], w, h, x[..., 4]], axis=-1)


def obb_corners(xywha):
    """(cx,cy,w,h,angle_rad) -> 4 corners (..., 4, 2).

    Corner ordering matches cv2.boxPoints: starting from the "bottom-left"
    of the rotated rect and going clockwise in image coords.
    """
    cx, cy, w, h, a = (
        xywha[..., 0],
        xywha[..., 1],
        xywha[..., 2],
        xywha[..., 3],
        xywha[..., 4],
    )
    ca, sa = jnp.cos(a), jnp.sin(a)
    hw, hh = w / 2.0, h / 2.0
    # Local corner offsets (cv2.boxPoints order): (-w/2,h/2),(-w/2,-h/2),(w/2,-h/2),(w/2,h/2)
    lx = jnp.stack([-hw, -hw, hw, hw], axis=-1)
    ly = jnp.stack([hh, -hh, -hh, hh], axis=-1)
    px = cx[..., None] + lx * ca[..., None] - ly * sa[..., None]
    py = cy[..., None] + lx * sa[..., None] + ly * ca[..., None]
    return jnp.stack([px, py], axis=-1)


def obb2xyxy(xywha):
    """Enclosing axis-aligned box of a rotated box."""
    corners = obb_corners(xywha)
    mins = corners.min(axis=-2)
    maxs = corners.max(axis=-2)
    return jnp.concatenate([mins, maxs], axis=-1)


def wrap_angle(angle):
    """Wrap to (-pi, pi] — matches BaseKalmanFilter._wrap_angle (base.py:117)."""
    return (angle + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
