"""Multi-chip sequence-parallel replay.

BoxMOT's concurrency model is per-sequence fan-out over threads and
processes (boxmot/engine/eval/replay.py:372-445).  The TPU-native
equivalent shards the *sequence batch axis* of the lockstep replay over
a jax.sharding.Mesh: each chip owns S/n_devices sequences, the whole
eval is one SPMD program, and no collectives are needed inside the
tracker update (results are gathered on the host once per batch).

ReID inference (when enabled) uses the same data-parallel mesh; its
batch axis is detections-per-frame x sequences.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boxmot_tpu.engine.replay import batch_replay, init_states


def sequence_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("seq",))


def shard_over_sequences(mesh: Mesh, tree):
    """Place a pytree with leading sequence-batch axis onto the mesh."""
    sharding = NamedSharding(mesh, P("seq"))
    return jax.device_put(tree, sharding)


def sharded_batch_replay(cfg, dets_batch: np.ndarray, mesh: Mesh | None = None):
    """Replay (S, F, D, 7) detection batches, S sharded over chips.

    Returns (final_states, outs (S, F, K, 8), masks (S, F, K)) — all
    sharded; index or np.asarray() to gather.
    """
    mesh = mesh or sequence_mesh()
    S = dets_batch.shape[0]
    n_dev = len(mesh.devices.flat)
    if S % n_dev != 0:
        raise ValueError(f"sequence batch {S} not divisible by {n_dev} devices")
    states = init_states(cfg, S)
    states = shard_over_sequences(mesh, states)
    dets_batch = shard_over_sequences(mesh, jax.numpy.asarray(dets_batch))
    return batch_replay(cfg, states, dets_batch)
