"""Native C++ host runtime: build, npy IO parity, frame packing parity."""

import numpy as np
import pytest

from boxmot_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)

RNG = np.random.default_rng(0)


def test_version():
    lib = native.get_library()
    assert b"boxmot_native" in lib.bmt_version()


def test_npy_roundtrip(tmp_path):
    arr = RNG.uniform(-5, 5, (17, 7)).astype(np.float32)
    path = tmp_path / "x.npy"
    native.write_npy(path, arr)
    # numpy reads what C++ wrote
    np.testing.assert_allclose(np.load(path), arr)
    # C++ reads what numpy wrote
    np.save(tmp_path / "y.npy", arr)
    back = native.read_npy(tmp_path / "y.npy")
    np.testing.assert_allclose(back, arr)


def test_npy_append_resume(tmp_path):
    path = tmp_path / "a.npy"
    native.append_npy(path, np.ones((3, 2), np.float32))
    native.append_npy(path, np.full((2, 2), 2.0, np.float32))
    data = np.load(path)
    assert data.shape == (5, 2)
    np.testing.assert_allclose(data[3:], 2.0)
    # and interoperates with the python AppendableNpyWriter reader side
    from boxmot_tpu.data.cache import AppendableNpyWriter

    with AppendableNpyWriter(path, 2) as w:
        assert w.rows == 5
        w.append(np.full((1, 2), 3.0))
    assert np.load(path).shape == (6, 2)


def test_pack_frames_parity():
    from boxmot_tpu.engine.replay import pack_frames

    rng = np.random.default_rng(1)
    n_frames, rows = 7, []
    per_frame = []
    for f in range(n_frames):
        n = int(rng.integers(0, 5))
        d = rng.uniform(0, 100, (n, 6)).astype(np.float32)
        d[:, 4] = rng.uniform(0.1, 1.0, n)
        per_frame.append(d)
        for det in d:
            rows.append([f + 1, *det])
    rows = np.array(rows, np.float32).reshape(-1, 7)

    ref, _ = pack_frames(per_frame, D=8, F=8)
    got = native.pack_frames_native(rows, n_frames=8, max_dets=8, box_cols=4)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pack_frames_overflow_dropped():
    rows = np.array([[1, 0, 0, 10, 10, 0.9, 0]] * 5, np.float32)
    out = native.pack_frames_native(rows, n_frames=1, max_dets=3, box_cols=4)
    valid = (out[0, :, 4] >= 0).sum()
    assert valid == 3


def test_write_mot(tmp_path):
    rows = np.array(
        [[1, 2, 10, 20, 30, 40, 0.9, 1, 0], [2, 2, 11, 21, 30, 40, 0.8, 1, 1]],
        np.float64,
    )
    path = tmp_path / "seq.txt"
    assert native.write_mot_native(path, rows)
    back = np.loadtxt(path, delimiter=",", ndmin=2)
    np.testing.assert_allclose(back[:, :6], rows[:, :6])
    np.testing.assert_allclose(back[:, 6], rows[:, 6], atol=1e-6)


class TestNativeLapjv:
    def test_matches_scipy_objective(self):
        from scipy.optimize import linear_sum_assignment

        from boxmot_tpu.native import lapjv_native, native_available

        if not native_available():
            import pytest

            pytest.skip("native library unavailable")
        rng = np.random.default_rng(3)
        for _ in range(100):
            n, m = rng.integers(1, 10, 2)
            cost = rng.uniform(0, 2, (n, m))
            limit = float(rng.uniform(0.3, 1.5))
            r2c = lapjv_native(cost, limit)
            big = np.full((n + m, n + m), limit / 2.0)
            big[n:, m:] = 0.0
            big[:n, :m] = cost
            rows, cols = linear_sum_assignment(big)
            ref = np.full(n, -1, int)
            for r, c in zip(rows, cols):
                if r < n and c < m:
                    ref[r] = c

            def obj(a):
                used = set()
                t = 0.0
                for r, c in enumerate(a):
                    if c >= 0:
                        t += cost[r, c]
                        used.add(c)
                    else:
                        t += limit / 2
                return t + (m - len(used)) * limit / 2

            assert abs(obj(r2c) - obj(ref)) < 1e-9

    def test_empty_and_degenerate(self):
        from boxmot_tpu.native import lapjv_native, native_available

        if not native_available():
            import pytest

            pytest.skip("native library unavailable")
        assert lapjv_native(np.zeros((0, 3)), 1.0).shape == (0,)
        # one row, all costs above the limit -> unassigned
        r2c = lapjv_native(np.array([[5.0, 6.0]]), 1.0)
        assert r2c.tolist() == [-1]

    def test_linear_assignment_np_uses_native(self):
        from boxmot_tpu.ops.lap import linear_assignment_np

        cost = np.array([[0.1, 0.9], [0.8, 0.2]])
        m, ur, uc = linear_assignment_np(cost, 0.5)
        assert m.tolist() == [[0, 0], [1, 1]]
        assert len(ur) == 0 and len(uc) == 0
