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


def test_sharded_reid_features_matches_local():
    from boxmot_tpu.parallel.replay import sequence_mesh, sharded_reid_features
    from boxmot_tpu.reid.core import ReID

    reid = ReID(model_name="osnet_x0_25", crop_hw=(64, 32))
    rng = np.random.default_rng(0)
    crops = rng.uniform(-2, 2, (5, 64, 32, 3)).astype(np.float32)  # 5 % 8 != 0

    mesh = sequence_mesh()
    got = sharded_reid_features(reid, crops, mesh)
    assert got.shape == (5, reid.feature_dim)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)

    # local single-device forward as the oracle
    import jax.numpy as jnp

    ref = np.asarray(reid.model.apply(reid.variables, jnp.asarray(crops)))
    ref = ref / np.maximum(np.linalg.norm(ref, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # empty batch contract
    empty = sharded_reid_features(reid, np.zeros((0, 64, 32, 3), np.float32), mesh)
    assert empty.shape == (0, reid.feature_dim)
