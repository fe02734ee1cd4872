"""Pin the matmul precision of tracker-state programs.

On TPU, jax's default matmul precision runs fp32 matmuls as one bf16 MXU
pass (~1e-2 rel error) — fine for ReID backbones, but tracker steps
compare cosine similarities / Mahalanobis forms against razor-thin
thresholds (OccluBoost recovery_appearance_thresh=0.99), where bf16
error flips association decisions and breaks reference parity on TPU.
``ops/precision.tracker_jit`` traces those programs under matmul
precision 'highest'; these tests pin that property via the lowered
StableHLO (backend-independent, so they guard the TPU behavior even
when the suite runs on the CPU mesh).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxmot_tpu.ops.precision import tracker_jit


def dot_precisions(stablehlo_text):
    """All precision annotations on dot/dot_general ops in the module."""
    out = []
    for line in stablehlo_text.splitlines():
        if "dot_general" in line or "stablehlo.dot" in line:
            m = re.search(r"precision\s*=\s*\[([A-Z_,\s]+)\]", line)
            if m:
                out.extend(p.strip() for p in m.group(1).split(","))
            else:
                out.append("DEFAULT")  # unannotated dot == default
    return out


class TestTrackerJit:
    def test_wraps_matmul_at_highest(self):
        f = tracker_jit(lambda a, b: a @ b)
        text = f.lower(jnp.ones((8, 8)), jnp.ones((8, 8))).as_text()
        precs = dot_precisions(text)
        assert precs and all(p == "HIGHEST" for p in precs), precs

    def test_plain_jit_is_not_highest(self):
        # contrast: proves the HIGHEST assertion above is meaningful
        f = jax.jit(lambda a, b: a @ b)
        text = f.lower(jnp.ones((8, 8)), jnp.ones((8, 8))).as_text()
        assert all(p != "HIGHEST" for p in dot_precisions(text))

    def test_static_argnames_passthrough(self):
        calls = []

        @tracker_jit(static_argnames=("flag",))
        def f(x, flag):
            calls.append(flag)
            return x * (2.0 if flag else 3.0)

        assert float(f(jnp.float32(1.0), flag=True)) == 2.0
        assert float(f(jnp.float32(1.0), flag=False)) == 3.0
        assert calls == [True, False]  # one trace per static value


def _assert_all_dots_highest(text, what):
    precs = dot_precisions(text)
    assert precs, f"{what}: expected at least one dot op"
    bad = [p for p in precs if p != "HIGHEST"]
    assert not bad, f"{what}: {len(bad)}/{len(precs)} dots not HIGHEST"


class TestTrackerPrograms:
    def test_botsort_step_all_dots_highest(self):
        from boxmot_tpu.trackers.botsort import BotSort, botsort_step, init_state

        trk = BotSort(with_reid=True, use_cmc=False, capacity=16)
        D, F = 8, trk.cfg.feat_dim
        text = botsort_step.lower(
            trk.cfg,
            init_state(trk.cfg),
            jnp.zeros((D, 7), jnp.float32),
            jnp.zeros((D,), bool),
            jnp.zeros((D, F), jnp.float32),
            jnp.eye(2, 3, dtype=jnp.float32),
        ).as_text()
        _assert_all_dots_highest(text, "botsort_step")

    def test_occluboost_step_all_dots_highest(self):
        from boxmot_tpu.trackers.occluboost import (
            OccluBoost,
            init_state,
            occluboost_step,
        )

        trk = OccluBoost(with_reid=True, use_cmc=False, capacity=16)
        D, F = 8, trk.cfg.feat_dim
        text = occluboost_step.lower(
            trk.cfg,
            init_state(trk.cfg),
            jnp.zeros((D, 7), jnp.float32),
            jnp.zeros((D,), bool),
            jnp.zeros((D, F), jnp.float32),
            jnp.eye(2, 3, dtype=jnp.float32),
        ).as_text()
        _assert_all_dots_highest(text, "occluboost_step")

    def test_scan_replay_all_dots_highest(self):
        from boxmot_tpu.engine.replay import scan_replay
        from boxmot_tpu.trackers.bytetrack import ByteTrackConfig, init_state

        cfg = ByteTrackConfig(capacity=16)
        dets = jnp.zeros((4, 8, 7), jnp.float32)
        text = scan_replay.lower(cfg, init_state(cfg), dets).as_text()
        _assert_all_dots_highest(text, "scan_replay(bytetrack)")
