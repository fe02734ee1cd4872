"""Assignment solver vs the exact lapjv-cost_limit oracle.

The auction solver must reproduce lapjv(extend_cost=True, cost_limit)
outcomes (matching.py:28-43): identical total cost on every instance and
identical match sets whenever the optimum is unique.
"""

import numpy as np
import jax.numpy as jnp

from boxmot_tpu.ops.lap import (
    linear_assignment,
    linear_assignment_np,
    masked_assignment,
)

RNG = np.random.default_rng(7)


def total_cost(cost, matches, thresh):
    # lapjv-equivalent objective: sum(c - thresh) over matched pairs.
    return sum(cost[r, c] - thresh for r, c in matches)


def assert_optimal(cost, thresh):
    m_ref, ur_ref, uc_ref = linear_assignment_np(cost, thresh)
    m_got, ur_got, uc_got = linear_assignment(cost, thresh)
    # All returned matches must be eligible.
    for r, c in m_got:
        assert cost[r, c] < thresh + 1e-6
    ref_obj = total_cost(cost, m_ref, thresh)
    got_obj = total_cost(cost, m_got, thresh)
    assert got_obj <= ref_obj + 1e-3, (got_obj, ref_obj)


def test_simple_exact_case():
    cost = np.array(
        [
            [0.1, 0.9, 0.9],
            [0.9, 0.2, 0.9],
            [0.9, 0.9, 0.95],
        ],
        np.float32,
    )
    matches, ur, uc = linear_assignment(cost, 0.8)
    got = {tuple(m) for m in matches}
    assert got == {(0, 0), (1, 1)}
    assert list(ur) == [2]
    assert list(uc) == [2]


def test_cost_limit_tradeoff():
    # Matching both rows costs 1.8 < leaving one row+col unmatched (0.9+1.0=1.9
    # in augmented terms). lapjv semantics prefer the full matching.
    L = 1.0
    cost = np.array([[0.9 * L, 0.9 * L], [0.9 * L, 10.0]], np.float32)
    m_ref, _, _ = linear_assignment_np(cost, L)
    m_got, _, _ = linear_assignment(cost, L)
    assert {tuple(m) for m in m_ref} == {(0, 1), (1, 0)}
    assert {tuple(m) for m in m_got} == {(0, 1), (1, 0)}


def test_empty():
    matches, ur, uc = linear_assignment(np.zeros((0, 5), np.float32), 0.5)
    assert matches.shape == (0, 2)
    assert len(ur) == 0 and len(uc) == 5


def test_all_above_limit():
    cost = np.full((4, 3), 5.0, np.float32)
    matches, ur, uc = linear_assignment(cost, 0.5)
    assert len(matches) == 0
    assert len(ur) == 4 and len(uc) == 3


def test_random_instances_optimality():
    for trial in range(30):
        n = int(RNG.integers(1, 24))
        m = int(RNG.integers(1, 24))
        cost = RNG.uniform(0, 1.2, (n, m)).astype(np.float32)
        thresh = float(RNG.uniform(0.3, 1.0))
        assert_optimal(cost, thresh)


def test_unique_optimum_exact_match():
    # Well-separated costs -> unique optimum; match sets must agree exactly.
    for trial in range(20):
        n = int(RNG.integers(2, 16))
        m = int(RNG.integers(2, 16))
        cost = np.round(RNG.uniform(0, 1, (n, m)), 1).astype(np.float32)
        cost += RNG.uniform(0, 0.013, (n, m)).astype(np.float32)  # break ties
        thresh = 0.75
        m_ref, _, _ = linear_assignment_np(cost, thresh)
        m_got, _, _ = linear_assignment(cost, thresh)
        ref_obj = total_cost(cost, m_ref, thresh)
        got_obj = total_cost(cost, m_got, thresh)
        np.testing.assert_allclose(got_obj, ref_obj, atol=2e-3)


def test_masked_assignment_respects_masks():
    R, C = 8, 8
    cost = RNG.uniform(0, 1, (R, C)).astype(np.float32)
    row_mask = np.zeros(R, bool)
    col_mask = np.zeros(C, bool)
    row_mask[:3] = True
    col_mask[:4] = True
    r2c = np.asarray(
        masked_assignment(jnp.asarray(cost), jnp.asarray(row_mask), jnp.asarray(col_mask), 2.0)
    )
    assert np.all(r2c[3:] == -1)
    matched = r2c[:3]
    for c in matched:
        assert c == -1 or c < 4
    # Valid 3x4 block with limit 2.0 > all costs: all 3 rows matched.
    assert np.all(matched >= 0)
    assert len(set(matched.tolist())) == 3


def test_masked_matches_dense_subproblem():
    for trial in range(10):
        R, C = 16, 16
        n = int(RNG.integers(1, 10))
        m = int(RNG.integers(1, 10))
        cost_full = RNG.uniform(0, 1.1, (R, C)).astype(np.float32)
        row_mask = np.arange(R) < n
        col_mask = np.arange(C) < m
        thresh = 0.7
        r2c = np.asarray(
            masked_assignment(
                jnp.asarray(cost_full), jnp.asarray(row_mask), jnp.asarray(col_mask), thresh
            )
        )
        matches = [(r, r2c[r]) for r in range(n) if r2c[r] >= 0]
        m_ref, _, _ = linear_assignment_np(cost_full[:n, :m], thresh)
        got_obj = total_cost(cost_full, matches, thresh)
        ref_obj = total_cost(cost_full[:n, :m], m_ref, thresh)
        assert got_obj <= ref_obj + 2e-3
