"""Cache generation: detections, segmentation masks, appearance embeddings.

Mirror of the reference generate workflow (boxmot/engine/eval/cache.py:
434-1328): for each sequence, write a resumable detection cache; when the
detector produces instance masks, a bit-packed seg-mask cache aligned
row-for-row with the detections (cache.py:930-943); and, when a ReID
model is given, an embedding cache aligned with the *cached* detection
rows — so an embeddings-only re-run fills embs for an existing det cache
without re-detecting (cache.py:1024 embed-only states).  Detections come
from a detector backend when one is supplied or from the sequence's
public det.txt ("public" detector id); ReID crops are batched with OOM
autotune (inference.py:332-388).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from boxmot_tpu.data.cache import (
    AppendableNpyWriter,
    det_cache_path,
    emb_cache_path,
    mask_cache_path,
    pack_masks,
)
from boxmot_tpu.data.mot import MOTDataset


def load_frame(path: Path) -> np.ndarray:
    """Read an image as BGR uint8 (the tracker-facing convention).

    Delegates to the single shared decoder so cache hits and disk
    fallbacks behave identically (incl. .npy frames for OBB layouts).
    """
    from boxmot_tpu.data.frame_cache import read_frame

    return read_frame(Path(path))


def _generate_dets(
    seq, dpath, detector_model, mpath=None, read=load_frame, progress=None,
):
    """Detector-driven det (+ optional packed-mask) caches, resumable at
    frame granularity: rows for frame f are written only once all rows of
    frames < f are present."""
    writer = AppendableNpyWriter(dpath, 7)
    mask_writer = None
    n_frames = min(seq.seq_length, len(seq.img_paths))
    done_rows = writer.rows
    # Find the resume frame by replaying the cached frame column.
    start_frame = 0
    if done_rows:
        cached = np.load(dpath, mmap_mode="r")
        start_frame = int(cached[:, 0].max())
        del cached
    acc_rows = done_rows
    for f in range(start_frame, n_frames):
        img = read(seq.img_paths[f])
        result = detector_model(img)
        dets = result.as_dets()
        rows = np.column_stack(
            [np.full(len(dets), f + 1, np.float32), dets]
        ) if len(dets) else np.zeros((0, 7), np.float32)
        writer.append(rows)
        if getattr(result, "masks", None) is not None:
            if mask_writer is None and mpath is not None:
                from boxmot_tpu.data.cache import _MASK_PACKED

                mask_writer = AppendableNpyWriter(mpath, _MASK_PACKED)
            if mask_writer is not None:
                mask_writer.append(pack_masks(f + 1, result.masks))
        acc_rows += len(rows)
        if progress is not None:
            progress(seq.name, f + 1, n_frames)
    writer.close()
    if mask_writer is not None:
        mask_writer.close()
    return acc_rows


def _fill_embeddings(
    seq, dets_per_frame, epath, reid_model, frame_cache=True, progress=None,
    batch_size: int = 0, auto_batch: bool = True, frame_group: int = 1,
):
    """Embedding cache aligned row-for-row with dets_per_frame (which may
    come from det.txt or from an existing det cache).

    ``frame_group > 1`` batches that many frames' crops into ONE device
    program (`ReID.get_features_multi`) — sparse scenes then run at the
    crop batch size the MXU wants and pay one dispatch per group
    instead of per frame.  Per-crop math is identical; grouping only
    changes batch packing.
    """
    from boxmot_tpu.data.frame_cache import FrameCache
    from boxmot_tpu.utils.autobatch import AutoBatcher

    n_total = sum(len(d) for d in dets_per_frame)
    feat = reid_model.feature_dim
    ew = AppendableNpyWriter(epath, 1 + feat)
    cache = (
        FrameCache(list(seq.img_paths), fallback=load_frame)
        if frame_cache and ew.rows < n_total
        else None
    )
    read = cache.read_image if cache is not None else load_frame
    batcher = AutoBatcher(batch_size, auto=auto_batch) if batch_size else None
    done_rows = ew.rows
    acc = 0

    def _write(f, d, feats):
        nonlocal acc, done_rows
        start = max(done_rows - acc, 0)
        rows = np.column_stack(
            [np.full(len(d) - start, f + 1, np.float32), feats[start:]]
        )
        ew.append(rows)
        acc += len(d)
        done_rows = ew.rows
        if progress is not None:
            progress(seq.name, f + 1, len(dets_per_frame))

    group: list[tuple[int, np.ndarray]] = []

    def _flush_group():
        if not group:
            return
        imgs = [read(seq.img_paths[f]) for f, _ in group]
        feats_list = reid_model.get_features_multi(
            [d[:, :4] for _, d in group], imgs
        )
        for (f, d), feats in zip(group, feats_list):
            _write(f, d, feats)
        group.clear()

    for f, d in enumerate(dets_per_frame):
        if len(d) == 0:
            continue
        if acc + len(d) <= done_rows:
            acc += len(d)
            continue
        if f >= len(seq.img_paths):
            break
        if (
            frame_group > 1
            and batcher is None
            and hasattr(reid_model, "get_features_multi")
            and done_rows <= acc  # group only fully-uncached frames
        ):
            group.append((f, d))
            if len(group) >= frame_group:
                _flush_group()
            continue
        img = read(seq.img_paths[f])
        boxes = d[:, :4]
        if batcher is not None:
            feats = batcher.map(lambda b: reid_model.get_features(b, img), boxes)
        else:
            feats = reid_model.get_features(boxes, img)
        _write(f, d, feats)
    _flush_group()
    ew.close()
    if cache is not None:
        cache.clear()
    return done_rows


def _fill_warps(seq, wpath, cmc, read=load_frame, progress=None):
    """Per-frame camera-motion warps, resumable at frame granularity.

    The reference estimates CMC from decoded frames inside the tracker
    update; the lockstep device replay never touches images, so warps
    are estimated once here and replayed from cache
    (engine/replay.py scan_replay warps_seq input)."""
    writer = AppendableNpyWriter(wpath, 7)
    n_frames = min(seq.seq_length, len(seq.img_paths))
    start = writer.rows
    if start >= n_frames:
        writer.close()
        return start
    # CMC is sequential (prev-frame state): re-prime on resume.
    for f in range(n_frames):
        img = read(seq.img_paths[f])
        warp = np.asarray(cmc.apply(img), np.float32)
        if f >= start:
            writer.append(
                np.concatenate([[np.float32(f + 1)], warp.ravel()])[None]
            )
        if progress is not None:
            progress(seq.name, f + 1, n_frames)
    writer.close()
    return n_frames


def run_generate(
    data_root: Path,
    cache_root: Path,
    detector: str = "public",
    detector_model=None,
    reid_model=None,
    reid_name: str | None = None,
    preprocess: str = "resize",
    verbose: bool = False,
    frame_cache: bool = True,
    progress=None,
    batch_size: int = 0,
    auto_batch: bool = True,
    frame_group: int = 1,
    cmc_method: str | None = None,
) -> dict:
    """Generate det / mask / emb caches for every sequence.

    * ``detector_model``: a detector backend (boxmot_tpu.detectors); when
      given, detections (and masks, for seg models) come from inference;
      otherwise the sequence's public det.txt rows are cached.
    * Embeddings-only fill: when the det cache already exists, the emb
      stage aligns to the *cached* rows, so ``run_generate(...,
      reid_model=m)`` on a det-cached tree fills embeddings without
      re-detecting (reference cache.py:1024).
    * ``batch_size``/``auto_batch``: ReID crop batching with OOM backoff
      (reference inference.py:332-388); 0 = one call per frame.
    * ``frame_group``: >1 batches that many frames' crops into one
      device program (sparse-scene throughput; see _fill_embeddings).

    Returns {seq_name: {"dets": n_rows, "embs": n_rows, "masks": n_rows}}.
    """
    from boxmot_tpu.data.cache import load_cached_dets_per_frame
    from boxmot_tpu.utils.callbacks import safe_seq_progress_callback

    progress = safe_seq_progress_callback(progress)
    dataset = MOTDataset(data_root)
    if len(dataset) == 0:
        raise ValueError(f"no MOT sequences under {data_root}")
    stats = {}
    for seq in dataset:
        dpath = det_cache_path(cache_root, detector, seq.name)
        mpath = mask_cache_path(cache_root, detector, seq.name)

        if detector_model is not None:
            n_rows = _generate_dets(
                seq, dpath, detector_model, mpath=mpath, progress=progress
            )
            dets_per_frame = load_cached_dets_per_frame(dpath, seq.seq_length)
        else:
            dets_per_frame = seq.dets_per_frame()
            n_total = sum(len(d) for d in dets_per_frame)
            writer = AppendableNpyWriter(dpath, 7)
            if writer.rows < n_total:
                done = writer.rows
                acc = 0
                for f, d in enumerate(dets_per_frame):
                    if acc + len(d) <= done:
                        acc += len(d)
                        continue
                    start = max(done - acc, 0)
                    rows = np.column_stack(
                        [np.full(len(d) - start, f + 1, np.float32), d[start:]]
                    )
                    writer.append(rows)
                    acc += len(d)
                    done = writer.rows
            writer.close()
            n_rows = n_total
        stats[seq.name] = {
            "dets": n_rows,
            "embs": 0,
            "masks": int(np.load(mpath, mmap_mode="r").shape[0]) if mpath.exists() else 0,
        }

        if reid_model is not None:
            # Embeddings-only fill: align to cached det rows when the det
            # cache exists (it always does at this point), so a second
            # pass over a det-cached tree never re-detects.
            if dpath.exists():
                dets_per_frame = load_cached_dets_per_frame(dpath, seq.seq_length)
            rname = reid_name or getattr(reid_model, "model_name", "reid")
            epath = emb_cache_path(cache_root, detector, rname, seq.name, preprocess)
            stats[seq.name]["embs"] = _fill_embeddings(
                seq, dets_per_frame, epath, reid_model,
                frame_cache=frame_cache, progress=progress,
                batch_size=batch_size, auto_batch=auto_batch,
                frame_group=frame_group,
            )
        if cmc_method:
            from boxmot_tpu.data.cache import warp_cache_path
            from boxmot_tpu.motion.cmc import create_cmc

            wpath = warp_cache_path(cache_root, cmc_method, seq.name)
            stats[seq.name]["warps"] = _fill_warps(
                seq, wpath, create_cmc(cmc_method), progress=progress
            )
        if verbose:
            print(f"generated {seq.name}: {stats[seq.name]}")
    from boxmot_tpu.engine.results import GenerateResult

    return GenerateResult(stats)
