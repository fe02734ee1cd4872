"""Full-precision jit for tracker-state programs.

On TPU, jax's default matmul precision computes fp32 matmuls via one
bfloat16 MXU pass (~1e-2 relative error).  That is the right trade for
the ReID backbones (where the FLOPs are), but tracker steps compare
cosine similarities and Mahalanobis forms against razor-thin thresholds
(e.g. OccluBoost recovery_appearance_thresh=0.99) — bf16 error there
changes association decisions, so the same program gives different
tracks on TPU vs CPU and drifts from the reference semantics.

Tracker-state matmuls are tiny (capacity <= 256 rows, feat_dim <= 512),
nowhere near MXU-bound, so tracing them at ``highest`` precision (three
bf16 passes on TPU, exact fp32 on CPU) costs nothing measurable and
makes the device program numerically platform-stable.
"""

from __future__ import annotations

import functools

import jax


def tracker_jit(fn=None, *, static_argnames=()):
    """``jax.jit`` whose trace runs under matmul precision 'highest'."""

    def wrap(f):
        @functools.wraps(f)
        def traced(*args, **kwargs):
            with jax.default_matmul_precision("highest"):
                return f(*args, **kwargs)

        return jax.jit(traced, static_argnames=static_argnames)

    return wrap if fn is None else wrap(fn)
