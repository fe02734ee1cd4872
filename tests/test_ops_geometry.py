import numpy as np
import pytest

from boxmot_tpu.ops import geometry as G


RNG = np.random.default_rng(0)


def rand_xyxy(n=32):
    x1 = RNG.uniform(0, 500, n)
    y1 = RNG.uniform(0, 500, n)
    w = RNG.uniform(1, 200, n)
    h = RNG.uniform(1, 200, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def test_xyxy_xywh_roundtrip():
    b = rand_xyxy()
    out = np.asarray(G.xywh2xyxy(G.xyxy2xywh(b)))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-3)


def test_xyxy2xywh_reference_semantics():
    b = np.array([[10.0, 20.0, 30.0, 60.0]], np.float32)
    out = np.asarray(G.xyxy2xywh(b))
    np.testing.assert_allclose(out, [[20.0, 40.0, 20.0, 40.0]])


def test_xyah_roundtrip():
    b = rand_xyxy()
    out = np.asarray(G.xyah2xyxy(G.xyxy2xyah(b)))
    np.testing.assert_allclose(out, b, rtol=1e-4, atol=1e-2)


def test_xyxy2xyah_matches_composed_reference_path():
    # Reference composes xyxy2xywh -> xywh2tlwh -> tlwh2xyah (bytetrack.py:38-43)
    b = rand_xyxy()
    xywh = np.asarray(G.xyxy2xywh(b))
    tlwh = np.asarray(G.xywh2tlwh(xywh))
    xyah_ref = np.asarray(G.tlwh2xyah(tlwh))
    np.testing.assert_allclose(np.asarray(G.xyxy2xyah(b)), xyah_ref, rtol=1e-5)


def test_xysr_roundtrip():
    b = rand_xyxy()
    out = np.asarray(G.xysr2xyxy(G.xyxy2xysr(b)))
    np.testing.assert_allclose(out, b, rtol=1e-3, atol=0.5)


def test_xysr_reference_semantics():
    # geometry.py:103-125: s = w*h, r = w/(h+1e-6)
    b = np.array([[0.0, 0.0, 10.0, 20.0]], np.float32)
    out = np.asarray(G.xyxy2xysr(b))[0]
    np.testing.assert_allclose(out, [5.0, 10.0, 200.0, 10.0 / 20.000001], rtol=1e-5)


def test_obb_corners_axis_aligned():
    obb = np.array([[50.0, 40.0, 20.0, 10.0, 0.0]], np.float32)
    corners = np.asarray(G.obb_corners(obb))[0]
    expected = {(40.0, 45.0), (40.0, 35.0), (60.0, 35.0), (60.0, 45.0)}
    got = {tuple(np.round(c, 4)) for c in corners}
    assert got == expected


def test_obb2xyxy_rotated_90():
    obb = np.array([[0.0, 0.0, 20.0, 10.0, np.pi / 2]], np.float32)
    out = np.asarray(G.obb2xyxy(obb))[0]
    np.testing.assert_allclose(out, [-5.0, -10.0, 5.0, 10.0], atol=1e-4)


def test_wrap_angle():
    a = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi], np.float32)
    out = np.asarray(G.wrap_angle(a))
    assert np.all(out > -np.pi - 1e-6)
    assert np.all(out <= np.pi + 1e-6)
    np.testing.assert_allclose(
        np.cos(out), np.cos(a), atol=1e-5
    )
    np.testing.assert_allclose(np.sin(out), np.sin(a), atol=1e-5)
