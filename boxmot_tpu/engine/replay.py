"""Sequence replay: run trackers over cached detections, on device.

The reference replays sequences with a per-frame Python loop and
thread/process pools (boxmot/engine/eval/replay.py:216-445).  The TPU
rebuild turns a whole sequence into ONE device program: `lax.scan` over
the jitted tracker step, so per-frame results never bounce through the
host, and `vmap` over a batch axis runs many sequences in lockstep —
that batch axis is also what gets sharded across chips in multi-device
eval (see boxmot_tpu.parallel).

Frame and detection counts are padded to static buckets; padding frames
carry no valid detections and padded outputs are sliced off on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boxmot_tpu.engine.mot_io import convert_to_mot_format

FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048)
DET_BUCKETS = (8, 16, 32, 64, 128, 256)


def resolve_tracker(cfg):
    """Map a tracker config dataclass to its (init_state, step) pair."""
    from boxmot_tpu.trackers import bytetrack, ocsort

    if isinstance(cfg, bytetrack.ByteTrackConfig):
        return bytetrack.init_state, bytetrack.bytetrack_step
    if isinstance(cfg, ocsort.OcSortConfig):
        return ocsort.init_state, ocsort.ocsort_step
    raise TypeError(f"unknown tracker config type {type(cfg).__name__}")


def init_state(cfg):
    return resolve_tracker(cfg)[0](cfg)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} exceeds largest bucket {buckets[-1]}")


def pack_frames(dets_per_frame, D=None, F=None):
    """Pack a list of (Ni, 6) det arrays into (F, D, 7) with det indices.

    Padding rows have conf = -1 and unit boxes (NaN-safe downstream).
    """
    n_frames = len(dets_per_frame)
    max_d = max((len(d) for d in dets_per_frame), default=1)
    D = D or _bucket(max(max_d, 1), DET_BUCKETS)
    F = F or _bucket(max(n_frames, 1), FRAME_BUCKETS)
    out = np.zeros((F, D, 7), np.float32)
    out[:, :, 2:4] = 1.0
    out[:, :, 4] = -1.0
    for f, d in enumerate(dets_per_frame):
        n = len(d)
        if n:
            out[f, :n, :6] = d[:, :6]
            out[f, :n, 6] = np.arange(n)
    return out, n_frames


@partial(jax.jit, static_argnames=("cfg",))
def scan_replay(cfg, state, dets_seq):
    """Replay one sequence on device.

    dets_seq: (F, D, 7).  Returns (state, outs (F, K, 8), masks (F, K)).
    """
    _, step_fn = resolve_tracker(cfg)

    def step(state, frame_dets):
        det_valid = frame_dets[:, 4] >= 0.0
        state, out, mask = step_fn(cfg, state, frame_dets, det_valid)
        return state, (out, mask)

    state, (outs, masks) = jax.lax.scan(step, state, dets_seq)
    return state, outs, masks


@partial(jax.jit, static_argnames=("cfg",))
def batch_replay(cfg, states, dets_batch):
    """Replay S sequences in lockstep: dets_batch (S, F, D, 7)."""
    return jax.vmap(lambda s, d: scan_replay(cfg, s, d))(states, dets_batch)


def init_states(cfg, n: int):
    """n fresh tracker states stacked along a batch axis."""
    one = init_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), one)


def replay_sequence(cfg, dets_per_frame, frame_offset: int = 0):
    """Replay one sequence and return MOT rows (N, 9) on the host.

    frame_offset shifts emitted frame numbers (frames are 1-based).
    """
    packed, n_frames = pack_frames(dets_per_frame)
    state = init_state(cfg)
    _, outs, masks = scan_replay(cfg, state, jnp.asarray(packed))
    outs = np.asarray(outs)
    masks = np.asarray(masks)
    rows = []
    for f in range(n_frames):
        frame_rows = outs[f][masks[f]]
        if len(frame_rows):
            rows.append(convert_to_mot_format(frame_rows, frame_offset + f + 1))
    if rows:
        return np.concatenate(rows, axis=0)
    return np.empty((0, 9), np.float32)
