"""Minimal scipy-backed shim for the `lap` package (only `lapjv`).

The reference implementation under /root/reference calls
``lap.lapjv(cost, extend_cost=True[, cost_limit=t])``
(boxmot/trackers/association/matching.py:36 and friends).  The real
``lap`` wheel is not installed in this environment; this shim restates
the JV cost-limit semantics via scipy's Hungarian solver on the
standard (n+m)x(n+m) augmented construction, so the reference tracker
stack can run as a differential-parity oracle.

Test-support code only — never imported by boxmot_tpu itself.
"""

import numpy as np
from scipy.optimize import linear_sum_assignment


def lapjv(cost, extend_cost=False, cost_limit=np.inf, return_cost=True):
    cost = np.asarray(cost, dtype=np.float64)
    if cost.ndim != 2:
        raise ValueError("lapjv expects a 2-D cost matrix")
    n, m = cost.shape
    x = np.full(n, -1, dtype=np.int64)
    y = np.full(m, -1, dtype=np.int64)
    if n == 0 or m == 0:
        return (0.0, x, y) if return_cost else (x, y)
    if n != m and not extend_cost:
        raise ValueError("rectangular cost needs extend_cost=True")

    if np.isfinite(cost_limit):
        # Augment with per-row/col dummies priced at limit/2 so a real
        # pairing is kept only when cost <= cost_limit (same construction
        # as boxmot_tpu.ops.lap.linear_assignment_np).
        big = np.full((n + m, n + m), cost_limit / 2.0)
        big[n:, m:] = 0.0
        big[:n, :m] = cost
        rows, cols = linear_sum_assignment(big)
        pairs = [(r, c) for r, c in zip(rows, cols) if r < n and c < m]
    else:
        rows, cols = linear_sum_assignment(cost)
        pairs = list(zip(rows, cols))

    total = 0.0
    for r, c in pairs:
        x[r] = c
        y[c] = r
        total += cost[r, c]
    return (total, x, y) if return_cost else (x, y)
