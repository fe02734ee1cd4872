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

from boxmot_tpu.ops.precision import tracker_jit

import jax
import jax.numpy as jnp
import numpy as np

from boxmot_tpu.engine.mot_io import convert_to_mot_format

FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048)
DET_BUCKETS = (8, 16, 32, 64, 128, 256)


def resolve_tracker(cfg):
    """Map a tracker config dataclass to (init_state, step).

    Steps are normalized to a uniform signature
    (cfg, state, dets, det_valid, embs, warp); motion-only trackers
    ignore the appearance/warp inputs.
    """
    from boxmot_tpu.trackers import boosttrack, botsort, bytetrack, deepocsort, hybridsort, occluboost, ocsort, sfsort, strongsort

    if isinstance(cfg, bytetrack.ByteTrackConfig):
        return bytetrack.init_state, (
            lambda cfg, st, dets, dv, embs, warp: bytetrack.bytetrack_step(
                cfg, st, dets, dv
            )
        )
    if isinstance(cfg, ocsort.OcSortConfig):
        return ocsort.init_state, (
            lambda cfg, st, dets, dv, embs, warp: ocsort.ocsort_step(
                cfg, st, dets, dv
            )
        )
    if isinstance(cfg, botsort.BotSortConfig):
        return botsort.init_state, botsort.botsort_step
    if isinstance(cfg, deepocsort.DeepOcSortConfig):
        return deepocsort.init_state, deepocsort.deepocsort_step
    if isinstance(cfg, boosttrack.BoostTrackConfig):
        return boosttrack.init_state, boosttrack.boosttrack_step
    if isinstance(cfg, occluboost.OccluBoostConfig):
        return occluboost.init_state, occluboost.occluboost_step
    if isinstance(cfg, strongsort.StrongSortConfig):
        return strongsort.init_state, strongsort.strongsort_step
    if isinstance(cfg, hybridsort.HybridSortConfig):
        return hybridsort.init_state, hybridsort.hybridsort_step
    if isinstance(cfg, sfsort.SFSortConfig):
        return sfsort.init_state, (
            lambda cfg, st, dets, dv, embs, warp: sfsort.sfsort_step(
                cfg, st, dets, dv
            )
        )
    raise TypeError(f"unknown tracker config type {type(cfg).__name__}")


def _default_embs(cfg, F, D):
    feat_dim = getattr(cfg, "feat_dim", 1)
    return jnp.zeros((F, D, feat_dim), jnp.float32)


def _default_warps(F):
    ident = jnp.eye(2, 3, dtype=jnp.float32)
    return jnp.broadcast_to(ident, (F, 2, 3))


def init_state(cfg):
    return resolve_tracker(cfg)[0](cfg)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} exceeds largest bucket {buckets[-1]}")


def pack_frames(dets_per_frame, D=None, F=None, det_cols: int = 6):
    """Pack a list of (Ni, det_cols) det arrays into (F, D, det_cols + 1)
    with det indices appended.  det_cols is 6 for AABB [x1,y1,x2,y2,conf,cls]
    and 7 for OBB [cx,cy,w,h,theta,conf,cls].

    Padding rows have conf = -1 and unit boxes (NaN-safe downstream).
    """
    conf_idx = det_cols - 2
    n_frames = len(dets_per_frame)
    max_d = max((len(d) for d in dets_per_frame), default=1)
    D = D or _bucket(max(max_d, 1), DET_BUCKETS)
    F = F or _bucket(max(n_frames, 1), FRAME_BUCKETS)
    out = np.zeros((F, D, det_cols + 1), np.float32)
    out[:, :, 2:4] = 1.0
    out[:, :, conf_idx] = -1.0
    for f, d in enumerate(dets_per_frame):
        n = len(d)
        if n:
            out[f, :n, :det_cols] = d[:, :det_cols]
            out[f, :n, det_cols] = np.arange(n)
    return out, n_frames


@partial(tracker_jit, static_argnames=("cfg",))
def scan_replay(cfg, state, dets_seq, embs_seq=None, warps_seq=None):
    """Replay one sequence on device.

    dets_seq: (F, D, 7); embs_seq: optional (F, D, feat_dim) cached
    appearance embeddings; warps_seq: optional (F, 2, 3) camera-motion
    warps.  Returns (state, outs (F, K, out_cols), masks (F, K)).
    """
    _, step_fn = resolve_tracker(cfg)
    F, D = dets_seq.shape[0], dets_seq.shape[1]
    if embs_seq is None:
        embs_seq = _default_embs(cfg, F, D)
    if warps_seq is None:
        warps_seq = _default_warps(F)

    conf_i = 5 if getattr(cfg, "is_obb", False) else 4

    def step(state, xs):
        frame_dets, embs, warp = xs
        det_valid = frame_dets[:, conf_i] >= 0.0
        state, out, mask = step_fn(cfg, state, frame_dets, det_valid, embs, warp)
        return state, (out, mask)

    state, (outs, masks) = jax.lax.scan(step, state, (dets_seq, embs_seq, warps_seq))
    return state, outs, masks


@partial(tracker_jit, static_argnames=("cfg",))
def batch_replay(cfg, states, dets_batch, embs_batch=None, warps_batch=None):
    """Replay S sequences in lockstep: dets_batch (S, F, D, 7)."""
    S, F, D = dets_batch.shape[0], dets_batch.shape[1], dets_batch.shape[2]
    if embs_batch is None:
        embs_batch = jnp.broadcast_to(
            _default_embs(cfg, F, D), (S, F, D, getattr(cfg, "feat_dim", 1))
        )
    if warps_batch is None:
        warps_batch = jnp.broadcast_to(_default_warps(F), (S, F, 2, 3))
    return jax.vmap(lambda s, d, e, w: scan_replay(cfg, s, d, e, w))(
        states, dets_batch, embs_batch, warps_batch
    )


def init_states(cfg, n: int):
    """n fresh tracker states stacked along a batch axis."""
    one = init_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), one)


def pack_embs(embs_per_frame, feat_dim, D=None, F=None):
    """Pack per-frame (Ni, F) embeddings into (F, D, feat_dim)."""
    n_frames = len(embs_per_frame)
    max_d = max((len(e) for e in embs_per_frame), default=1)
    D = D or _bucket(max(max_d, 1), DET_BUCKETS)
    F = F or _bucket(max(n_frames, 1), FRAME_BUCKETS)
    out = np.zeros((F, D, feat_dim), np.float32)
    for f, e in enumerate(embs_per_frame):
        if len(e):
            out[f, : len(e)] = e
    return out


def _unpack_mot_rows(outs, masks, n_frames, frame_offset: int = 0):
    """Gather device replay outputs for one sequence into MOT rows."""
    rows = []
    for f in range(n_frames):
        frame_rows = outs[f][masks[f]]
        if len(frame_rows):
            rows.append(convert_to_mot_format(frame_rows, frame_offset + f + 1))
    if rows:
        return np.concatenate(rows, axis=0)
    return np.empty((0, 9), np.float32)


def replay_sequences_batched(cfg, seqs, devices=None):
    """Replay many sequences as batched device programs.

    ``seqs`` is a list of dicts with keys ``dets`` (list of per-frame
    (Ni, 6|7) arrays), optional ``embs`` (per-frame (Ni, feat) arrays)
    and optional ``warps`` ((F, 2, 3) camera-motion warps).  Returns a
    list of MOT row arrays in input order.

    This is the eval hot path the reference covers with per-sequence
    thread/process pools (boxmot/engine/eval/replay.py:372-445); here
    sequences sharing a (frame, det) bucket run in lockstep as ONE
    vmapped lax.scan, and the sequence axis shards over the device mesh
    when more than one chip is attached (boxmot_tpu/parallel/replay.py).
    Per-sequence results are bit-identical to replay_sequence: grouping
    only batches independent programs, it never mixes sequences.
    """
    det_cols = 7 if getattr(cfg, "is_obb", False) else 6
    feat_dim = getattr(cfg, "feat_dim", 1)
    devices = devices if devices is not None else jax.devices()

    groups: dict[tuple[int, int], list[int]] = {}
    for i, s in enumerate(seqs):
        dets = s["dets"]
        max_d = max((len(d) for d in dets), default=1)
        key = (
            _bucket(max(len(dets), 1), FRAME_BUCKETS),
            _bucket(max(max_d, 1), DET_BUCKETS),
        )
        groups.setdefault(key, []).append(i)

    results: list = [None] * len(seqs)
    for (F, D), idxs in groups.items():
        packed, embs_b, warps_b, n_frames_list = [], [], [], []
        want_embs = any(seqs[i].get("embs") is not None for i in idxs)
        want_warps = any(seqs[i].get("warps") is not None for i in idxs)
        for i in idxs:
            s = seqs[i]
            p, n_frames = pack_frames(s["dets"], D=D, F=F, det_cols=det_cols)
            packed.append(p)
            n_frames_list.append(n_frames)
            if want_embs:
                e = s.get("embs")
                embs_b.append(
                    pack_embs(e, feat_dim, D=D, F=F)
                    if e is not None
                    else np.zeros((F, D, feat_dim), np.float32)
                )
            if want_warps:
                w = np.broadcast_to(
                    np.eye(2, 3, dtype=np.float32), (F, 2, 3)
                ).copy()
                sw = s.get("warps")
                if sw is not None:
                    w[: len(sw)] = sw
                warps_b.append(w)
        dets_batch = np.stack(packed)
        embs_batch = np.stack(embs_b) if want_embs else None
        warps_batch = np.stack(warps_b) if want_warps else None
        if len(devices) > 1:
            from boxmot_tpu.parallel.replay import (
                sequence_mesh,
                sharded_batch_replay,
            )

            _, outs, masks = sharded_batch_replay(
                cfg,
                dets_batch,
                sequence_mesh(devices),
                embs_batch=embs_batch,
                warps_batch=warps_batch,
            )
        else:
            states = init_states(cfg, len(idxs))
            _, outs, masks = batch_replay(
                cfg,
                states,
                jnp.asarray(dets_batch),
                jnp.asarray(embs_batch) if embs_batch is not None else None,
                jnp.asarray(warps_batch) if warps_batch is not None else None,
            )
        outs = np.asarray(outs)
        masks = np.asarray(masks)
        for k, i in enumerate(idxs):
            results[i] = _unpack_mot_rows(outs[k], masks[k], n_frames_list[k])
    return results


def replay_sequence(cfg, dets_per_frame, embs_per_frame=None, warps=None, frame_offset: int = 0):
    """Replay one sequence and return MOT rows (N, 9) on the host.

    frame_offset shifts emitted frame numbers (frames are 1-based).
    """
    det_cols = 7 if getattr(cfg, "is_obb", False) else 6
    packed, n_frames = pack_frames(dets_per_frame, det_cols=det_cols)
    embs = None
    if embs_per_frame is not None:
        embs = jnp.asarray(
            pack_embs(
                embs_per_frame,
                getattr(cfg, "feat_dim", 1),
                D=packed.shape[1],
                F=packed.shape[0],
            )
        )
    warps_seq = None
    if warps is not None:
        w = np.broadcast_to(
            np.eye(2, 3, dtype=np.float32), (packed.shape[0], 2, 3)
        ).copy()
        w[: len(warps)] = warps
        warps_seq = jnp.asarray(w)
    state = init_state(cfg)
    _, outs, masks = scan_replay(cfg, state, jnp.asarray(packed), embs, warps_seq)
    return _unpack_mot_rows(
        np.asarray(outs), np.asarray(masks), n_frames, frame_offset
    )
