"""Batched KF bank vs the numpy oracle (reference recursion semantics)."""

import numpy as np
import jax.numpy as jnp

from boxmot_tpu.motion import kalman as K
from tests.oracle.kalman_np import XYAHOracle

RNG = np.random.default_rng(3)


def rand_xyah(n):
    cx = RNG.uniform(0, 1000, n)
    cy = RNG.uniform(0, 600, n)
    a = RNG.uniform(0.3, 0.7, n)
    h = RNG.uniform(40, 200, n)
    return np.stack([cx, cy, a, h], axis=-1)


def test_initiate_matches_oracle():
    layout = K.make_xyah_layout()
    oracle = XYAHOracle()
    z = rand_xyah(6)
    mean, cov = K.initiate(layout, jnp.asarray(z, jnp.float32))
    for i in range(6):
        m_ref, c_ref = oracle.initiate(z[i])
        np.testing.assert_allclose(np.asarray(mean)[i], m_ref, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cov)[i], c_ref, rtol=1e-4, atol=1e-8)


def test_predict_update_sequence_matches_oracle():
    layout = K.make_xyah_layout()
    oracle = XYAHOracle()
    KCAP = 8
    z0 = rand_xyah(KCAP)
    mean, cov = K.initiate(layout, jnp.asarray(z0, jnp.float32))
    means_ref = []
    covs_ref = []
    for i in range(KCAP):
        m, c = oracle.initiate(z0[i])
        means_ref.append(m)
        covs_ref.append(c)

    mask = jnp.ones(KCAP, bool)
    for step in range(5):
        mean, cov = K.predict(layout, mean, cov, mask)
        meas = rand_xyah(KCAP)
        # drift measurements around current positions to stay realistic
        meas[:, :2] = np.asarray(mean)[:, :2] + RNG.normal(0, 5, (KCAP, 2))
        mean, cov = K.update(
            layout, mean, cov, jnp.asarray(meas, jnp.float32), jnp.zeros(KCAP), mask
        )
        for i in range(KCAP):
            means_ref[i], covs_ref[i] = oracle.predict(means_ref[i], covs_ref[i])
            means_ref[i], covs_ref[i] = oracle.update(means_ref[i], covs_ref[i], meas[i])

    got_mean = np.asarray(mean)
    got_cov = np.asarray(cov)
    for i in range(KCAP):
        np.testing.assert_allclose(got_mean[i], means_ref[i], rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(got_cov[i], covs_ref[i], rtol=5e-3, atol=1e-3)


def test_masked_slots_untouched():
    layout = K.make_xyah_layout()
    z = rand_xyah(4)
    mean, cov = K.initiate(layout, jnp.asarray(z, jnp.float32))
    mask = jnp.array([True, False, True, False])
    mean2, cov2 = K.predict(layout, mean, cov, mask)
    np.testing.assert_array_equal(np.asarray(mean2)[1], np.asarray(mean)[1])
    np.testing.assert_array_equal(np.asarray(cov2)[3], np.asarray(cov)[3])
    assert not np.allclose(np.asarray(cov2)[0], np.asarray(cov)[0])

    meas = jnp.asarray(rand_xyah(4), jnp.float32)
    mean3, cov3 = K.update(layout, mean2, cov2, meas, jnp.zeros(4), mask)
    np.testing.assert_array_equal(np.asarray(mean3)[1], np.asarray(mean2)[1])
    assert not np.allclose(np.asarray(mean3)[0], np.asarray(mean2)[0])


def test_nsa_scaling_reduces_noise():
    # NSA (base.py:294-303): higher confidence -> smaller innovation cov ->
    # update pulls the state closer to the measurement.
    layout_nsa = K.make_xyah_layout(nsa=True)
    z = rand_xyah(1)
    mean, cov = K.initiate(layout_nsa, jnp.asarray(z, jnp.float32))
    mask = jnp.ones(1, bool)
    mean, cov = K.predict(layout_nsa, mean, cov, mask)
    meas = jnp.asarray(z + 20.0, jnp.float32)
    m_low, _ = K.update(layout_nsa, mean, cov, meas, jnp.array([0.1]), mask)
    m_high, _ = K.update(layout_nsa, mean, cov, meas, jnp.array([0.9]), mask)
    d_low = abs(float(m_low[0, 0]) - float(meas[0, 0]))
    d_high = abs(float(m_high[0, 0]) - float(meas[0, 0]))
    assert d_high < d_low


def test_gating_distance_matches_oracle():
    layout = K.make_xyah_layout()
    oracle = XYAHOracle()
    z = rand_xyah(3)
    mean, cov = K.initiate(layout, jnp.asarray(z, jnp.float32))
    mask = jnp.ones(3, bool)
    mean, cov = K.predict(layout, mean, cov, mask)
    meas = rand_xyah(5)
    got = np.asarray(K.gating_distance(layout, mean, cov, jnp.asarray(meas, jnp.float32)))
    m_np, c_np = np.asarray(mean, np.float64), np.asarray(cov, np.float64)
    for i in range(3):
        ref = oracle.gating_distance(m_np[i], c_np[i], meas)
        np.testing.assert_allclose(got[i], ref, rtol=2e-3, atol=1e-2)


def test_xysr_filter_shapes_and_stability():
    layout = K.make_xysr_layout()
    z = np.stack(
        [
            RNG.uniform(0, 1000, 4),
            RNG.uniform(0, 600, 4),
            RNG.uniform(500, 20000, 4),
            RNG.uniform(0.3, 0.8, 4),
        ],
        axis=-1,
    )
    mean, cov = K.initiate(layout, jnp.asarray(z, jnp.float32))
    assert mean.shape == (4, 7) and cov.shape == (4, 7, 7)
    mask = jnp.ones(4, bool)
    for _ in range(10):
        mean, cov = K.predict(layout, mean, cov, mask)
        mean, cov = K.update(
            layout, mean, cov, jnp.asarray(z, jnp.float32), jnp.zeros(4), mask
        )
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.isfinite(np.asarray(cov)))
    # Converged back to the repeated measurement.
    np.testing.assert_allclose(np.asarray(mean)[:, :2], z[:, :2], rtol=1e-3, atol=1.0)


def test_xywh_layout_roundtrip():
    layout = K.make_xywh_layout()
    z = rand_xyah(3)  # xywh has same shape contract
    z[:, 2] *= z[:, 3]  # make col2 a width
    mean, cov = K.initiate(layout, jnp.asarray(z, jnp.float32))
    mask = jnp.ones(3, bool)
    mean, cov = K.predict(layout, mean, cov, mask)
    mean, cov = K.update(
        layout, mean, cov, jnp.asarray(z, jnp.float32), jnp.zeros(3), mask
    )
    assert np.all(np.isfinite(np.asarray(mean)))


def test_obb_layout_angle_wrap():
    layout = K.make_xyah_layout(obb=True)
    z = np.concatenate([rand_xyah(2), [[4.0], [-4.5]]], axis=-1)  # angles out of range
    mean, _ = K.initiate(layout, jnp.asarray(z, jnp.float32))
    angles = np.asarray(mean)[:, 4]
    assert np.all(angles > -np.pi - 1e-5) and np.all(angles <= np.pi + 1e-5)
