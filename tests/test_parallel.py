"""Multi-device sequence-parallel replay on the 8-device CPU mesh."""

import numpy as np
import jax

from boxmot_tpu.engine.replay import batch_replay, init_states, scan_replay
from boxmot_tpu.trackers.bytetrack import ByteTrackConfig, init_state


def synthetic_batch(S, F, D, seed=0):
    rng = np.random.default_rng(seed)
    dets = np.zeros((S, F, D, 7), np.float32)
    dets[..., 2:4] = 1.0
    dets[..., 4] = -1.0
    for s in range(S):
        base = rng.uniform(50, 400, (3, 2))
        vel = rng.uniform(-3, 3, (3, 2))
        for f in range(F):
            for i in range(3):
                x, y = base[i] + vel[i] * f
                dets[s, f, i] = [x, y, x + 50, y + 90, 0.9, 0, i]
    return dets


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out, mask = jax.jit(fn)(*args)
    assert out.shape[1] == 8
    assert bool(np.asarray(mask).sum() >= 0)


def test_batch_replay_matches_single():
    cfg = ByteTrackConfig(capacity=32)
    S, F, D = 4, 16, 8
    dets = synthetic_batch(S, F, D)
    states = init_states(cfg, S)
    _, outs_b, masks_b = batch_replay(cfg, states, jax.numpy.asarray(dets))
    for s in range(S):
        _, outs_1, masks_1 = scan_replay(cfg, init_state(cfg), jax.numpy.asarray(dets[s]))
        np.testing.assert_allclose(
            np.asarray(outs_b)[s], np.asarray(outs_1), atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(masks_b)[s], np.asarray(masks_1))
