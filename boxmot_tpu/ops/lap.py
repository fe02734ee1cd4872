"""Linear assignment for data association, jit-compatible and masked.

The reference uses lap.lapjv(cost, extend_cost=True, cost_limit=thresh)
(boxmot/trackers/association/matching.py:28-43).  lapjv's cost_limit
construction builds an (n+m)x(n+m) matrix [[C, L/2],[L/2, 0]] and solves
it exactly.  That problem is mathematically equivalent to a *maximum
weight partial matching* on weights w_ij = thresh - c_ij restricted to
pairs with w_ij > 0:

    total = sum(c_matched) + (n + m - 2|x|) * thresh/2
          = sum(c_matched - thresh) + const
    => minimizing total  <=>  maximizing sum(thresh - c) over the matching.

So we solve max-weight partial matching with an epsilon-scaling auction
algorithm (Bertsekas).  The auction is embarrassingly parallel per
iteration (row argmax + column segment-max), making it a good fit for the
VPU, and the whole solve lives inside the per-frame XLA program.  The
result is optimal to within n_rows * eps_final, i.e. ~1e-4 in cost — far
below any margin that changes association outcomes in practice.

`linear_assignment_np` is the exact host-side oracle (scipy on the padded
matrix) used by tests and offline metrics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -jnp.inf


@functools.partial(jax.jit, static_argnames=("max_iters",))
def masked_assignment(
    cost: jax.Array,
    row_mask: jax.Array,
    col_mask: jax.Array,
    thresh,
    max_iters: int = 4000,
):
    """Solve masked linear assignment with lapjv cost_limit semantics.

    Max-weight matching is made a *full* assignment by giving every row an
    IMPLICIT private dummy option of value 0 (the skip/outside option) —
    the standard Bertsekas transformation.  The dummy never needs a price
    (only its own row can take it), so it stays out of the matrices: a row
    whose best net value drops below 0 retires to its dummy, permanently
    (prices only rise within the solve, so real options never recover).
    This keeps every per-iteration tensor at (R, C) instead of (R, C+R).

    A single eps round from zero prices.  Multi-round eps-scaling with
    carried prices is unsound for this asymmetric (dummy-augmented)
    formulation: re-auctioning from near-equilibrium prices leaves rows
    with ~zero net slack everywhere, so ties resolve arbitrarily and
    valid rows retire against stale prices (Bertsekas' asymmetric
    variant needs the full lambda/reverse-auction machinery).  Instead,
    callers that need *full* (max-cardinality) assignments must keep the
    positive offset on their weights SMALL — see `thresh` below: the
    auction's surrender depth for rows with no real prospects is
    (thresh - cost) / eps iterations, which is what made bound+1.0-style
    offsets stall for thousands of iterations at MOT17 density.

    eps is scaled by the observed weight range (not `thresh`), so the
    n_rows * eps optimality bound tracks the actual cost scale.

    Args:
        cost: (R, C) cost matrix; entries at invalid rows/cols are ignored.
        row_mask: (R,) bool validity of rows.
        col_mask: (C,) bool validity of cols.
        thresh: scalar cost limit; pairs with cost >= thresh never match.
        max_iters: safety bound on auction iterations.

    Returns:
        row_to_col: (R,) int32, matched column per row or -1.
    """
    R, C = cost.shape
    valid = row_mask[:, None] & col_mask[None, :]
    w = jnp.asarray(thresh, cost.dtype) - cost
    w = jnp.where(valid & (w > 0), w, _NEG)
    col_ids = jnp.arange(C, dtype=jnp.int32)
    w_max = jnp.max(jnp.where(jnp.isfinite(w), w, 0.0))
    eps = jnp.maximum(w_max, 1e-2) * 1e-4

    owner0 = jnp.full((C,), -1, jnp.int32)
    r2c0 = jnp.where(row_mask, -1, -2)  # -2: permanently out

    def cond(state):
        _, _, r2c, it = state
        return jnp.any(r2c == -1) & (it < max_iters)

    def body(state):
        prices, owner, r2c, it = state
        unassigned = r2c == -1
        v = w - prices[None, :]
        b1 = jnp.max(v, axis=1)
        jstar = jnp.argmax(v, axis=1).astype(jnp.int32)
        v2 = jnp.where(col_ids[None, :] == jstar[:, None], _NEG, v)
        b2 = jnp.max(v2, axis=1)
        # Second-best includes the dummy at value 0.
        second = jnp.maximum(jnp.where(jnp.isfinite(b2), b2, 0.0), 0.0)
        # Rows whose best real option is worse than the dummy retire.
        retire = unassigned & (b1 < 0)
        r2c = jnp.where(retire, -3, r2c)
        bidding = unassigned & ~retire
        bid = prices[jstar] + (b1 - second) + eps

        # Column side: highest bid per column wins (ties -> lowest row).
        onehot = (col_ids[None, :] == jstar[:, None]) & bidding[:, None]
        bids_rc = jnp.where(onehot, bid[:, None], _NEG)
        col_best = jnp.max(bids_rc, axis=0)
        col_winner = jnp.argmax(bids_rc, axis=0).astype(jnp.int32)
        has_bid = col_best > _NEG

        new_prices = jnp.where(has_bid, col_best, prices)
        new_owner = jnp.where(has_bid, col_winner, owner)

        # Dethrone previous owners of re-auctioned columns.
        deth_rows = jnp.where(has_bid & (owner >= 0), owner, R)
        r2c = r2c.at[deth_rows].set(-1, mode="drop")
        # Install winners.
        win_rows = jnp.where(has_bid, col_winner, R)
        r2c = r2c.at[win_rows].set(col_ids, mode="drop")
        return new_prices, new_owner, r2c, it + 1

    prices = jnp.zeros((C,), cost.dtype)
    _, _, r2c, _ = jax.lax.while_loop(
        cond, body, (prices, owner0, r2c0, jnp.int32(0))
    )
    matched_real = r2c >= 0
    return jnp.where(matched_real, r2c, -1).astype(jnp.int32)


def linear_assignment_np(cost: np.ndarray, thresh: float):
    """Exact host-side oracle mirroring reference linear_assignment
    (matching.py:28-43) using scipy on the lapjv cost_limit construction.

    Returns (matches (K,2) int array, unmatched_rows, unmatched_cols).
    """
    cost = np.asarray(cost, dtype=np.float64)
    n, m = cost.shape
    if cost.size == 0:
        return (
            np.empty((0, 2), dtype=int),
            np.arange(n),
            np.arange(m),
        )
    limit = float(thresh)
    # native JV solver when built (boxmot_tpu.native, bmt_lapjv) — exact
    # same augmented construction, no scipy dependency on the hot host path
    from boxmot_tpu.native import lapjv_native

    native = lapjv_native(cost, limit)
    if native is not None:
        row_to_col = native.astype(int)
    else:
        from scipy.optimize import linear_sum_assignment

        big = np.full((n + m, n + m), limit / 2.0, dtype=np.float64)
        big[n:, m:] = 0.0
        big[:n, :m] = cost
        rows, cols = linear_sum_assignment(big)
        row_to_col = np.full(n, -1, dtype=int)
        for r, c in zip(rows, cols):
            if r < n and c < m:
                row_to_col[r] = c
    matches = np.array(
        [[r, row_to_col[r]] for r in range(n) if row_to_col[r] >= 0], dtype=int
    ).reshape(-1, 2)
    unmatched_rows = np.array([r for r in range(n) if row_to_col[r] < 0], dtype=int)
    matched_cols = set(matches[:, 1].tolist())
    unmatched_cols = np.array([c for c in range(m) if c not in matched_cols], dtype=int)
    return matches, unmatched_rows, unmatched_cols


def linear_assignment(cost, thresh: float):
    """Device-backed equivalent of reference linear_assignment: accepts an
    (n, m) cost matrix, returns (matches, unmatched_rows, unmatched_cols)
    as numpy arrays.  Thin host wrapper over masked_assignment for API
    parity; in-graph users call masked_assignment directly.
    """
    cost = np.asarray(cost)
    n, m = cost.shape
    if cost.size == 0:
        return np.empty((0, 2), dtype=int), np.arange(n), np.arange(m)
    # Pad to power-of-two buckets so repeated host calls reuse the jit cache.
    R = max(8, 1 << (n - 1).bit_length())
    C = max(8, 1 << (m - 1).bit_length())
    padded = np.zeros((R, C), np.float32)
    padded[:n, :m] = cost
    r2c = np.asarray(
        masked_assignment(
            jnp.asarray(padded),
            jnp.arange(R) < n,
            jnp.arange(C) < m,
            thresh,
        )
    )[:n]
    matches = np.array(
        [[r, r2c[r]] for r in range(n) if r2c[r] >= 0], dtype=int
    ).reshape(-1, 2)
    unmatched_rows = np.array([r for r in range(n) if r2c[r] < 0], dtype=int)
    matched_cols = set(matches[:, 1].tolist())
    unmatched_cols = np.array([c for c in range(m) if c not in matched_cols], dtype=int)
    return matches, unmatched_rows, unmatched_cols
