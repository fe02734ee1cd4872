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


def sharded_batch_replay(
    cfg,
    dets_batch: np.ndarray,
    mesh: Mesh | None = None,
    embs_batch: np.ndarray | None = None,
    warps_batch: np.ndarray | None = None,
):
    """Replay (S, F, D, 7) detection batches, S sharded over chips.

    S is padded up to a multiple of the device count with empty sequences
    (all-padding detections, conf = -1), so any sequence batch shards;
    callers slice outputs back to the original S.  Returns
    (final_states, outs (S_pad, F, K, 8), masks (S_pad, F, K)) — all
    sharded; index or np.asarray() to gather.
    """
    import jax.numpy as jnp

    mesh = mesh or sequence_mesh()
    S = dets_batch.shape[0]
    n_dev = len(mesh.devices.flat)
    pad = (-S) % n_dev
    if pad:
        empty = np.zeros((pad,) + dets_batch.shape[1:], np.float32)
        empty[..., 2:4] = 1.0
        conf_i = 5 if getattr(cfg, "is_obb", False) else 4
        empty[..., conf_i] = -1.0
        dets_batch = np.concatenate([np.asarray(dets_batch), empty])
        if embs_batch is not None:
            embs_batch = np.concatenate(
                [
                    np.asarray(embs_batch),
                    np.zeros((pad,) + embs_batch.shape[1:], np.float32),
                ]
            )
        if warps_batch is not None:
            ident = np.broadcast_to(
                np.eye(2, 3, dtype=np.float32),
                (pad,) + warps_batch.shape[1:],
            )
            warps_batch = np.concatenate([np.asarray(warps_batch), ident])
    states = init_states(cfg, S + pad)
    states = shard_over_sequences(mesh, states)
    dets_batch = shard_over_sequences(mesh, jnp.asarray(dets_batch))
    if embs_batch is not None:
        embs_batch = shard_over_sequences(mesh, jnp.asarray(embs_batch))
    if warps_batch is not None:
        warps_batch = shard_over_sequences(mesh, jnp.asarray(warps_batch))
    return batch_replay(cfg, states, dets_batch, embs_batch, warps_batch)


def sharded_reid_features(reid, crops_batch: np.ndarray, mesh: Mesh | None = None):
    """Data-parallel ReID forward: (N, H, W, 3) standardized crops with N
    sharded over the mesh; parameters replicated (SURVEY 2.9: ReID crop
    batches are standard data-parallel inference on the MXU).

    Pads N up to a multiple of the device count, so any crop batch works.
    Returns (N, F) L2-normalized float32 embeddings on the host.
    """
    import jax.numpy as jnp

    mesh = mesh or sequence_mesh()
    n_dev = len(mesh.devices.flat)
    n = crops_batch.shape[0]
    if n == 0:
        return np.zeros((0, reid.feature_dim), np.float32)
    pad = (-n) % n_dev
    if pad:
        crops_batch = np.concatenate(
            [crops_batch, np.zeros((pad, *crops_batch.shape[1:]), crops_batch.dtype)]
        )
    data = jax.device_put(
        jnp.asarray(crops_batch), NamedSharding(mesh, P("seq"))
    )
    params = jax.device_put(reid.variables, NamedSharding(mesh, P()))

    # Cache the jitted forward on the reid instance: a fresh closure per
    # call would retrace + recompile the XLA program every frame.
    fwd = getattr(reid, "_sharded_forward", None)
    if fwd is None:
        model = reid.model

        @jax.jit
        def fwd(variables, x):
            feats = model.apply(variables, x).astype(jnp.float32)
            norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
            return feats / jnp.maximum(norm, 1e-12)

        reid._sharded_forward = fwd

    out = np.asarray(fwd(params, data))
    return out[:n]
