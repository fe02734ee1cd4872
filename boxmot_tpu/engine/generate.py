"""Cache generation: detections + appearance embeddings per sequence.

Mirror of the reference generate workflow (boxmot/engine/eval/cache.py:
434-1328): for each sequence, write a resumable detection cache and, when
a ReID model is given, an embedding cache aligned row-for-row with the
detections.  Detections come from a detector backend when available or
from the sequence's public det.txt ("public" detector id); frames are
read with PIL (no OpenCV dependency).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from boxmot_tpu.data.cache import (
    AppendableNpyWriter,
    det_cache_path,
    emb_cache_path,
)
from boxmot_tpu.data.mot import MOTDataset


def load_frame(path: Path) -> np.ndarray:
    """Read an image as BGR uint8 (the tracker-facing convention).

    Delegates to the single shared decoder so cache hits and disk
    fallbacks behave identically (incl. .npy frames for OBB layouts).
    """
    from boxmot_tpu.data.frame_cache import read_frame

    return read_frame(Path(path))


def run_generate(
    data_root: Path,
    cache_root: Path,
    detector: str = "public",
    reid_model=None,
    reid_name: str | None = None,
    preprocess: str = "resize",
    verbose: bool = False,
    frame_cache: bool = True,
    progress=None,
) -> dict:
    """Generate det (and optionally emb) caches for every sequence.

    When ``frame_cache`` is on and a ReID model needs the images, the
    sequence's frames are preloaded into a RAM-budgeted FrameCache
    (mirrors the reference's cache.py:434 FrameCache usage) so crop
    extraction is not gated on disk IO.  ``progress`` is an optional
    (seq_name, current_frame, total_frames) callback; it is wrapped so a
    raising callback can never abort the run.

    Returns {seq_name: {"dets": n_rows, "embs": n_rows}}.
    """
    from boxmot_tpu.utils.callbacks import safe_seq_progress_callback

    progress = safe_seq_progress_callback(progress)
    dataset = MOTDataset(data_root)
    if len(dataset) == 0:
        raise ValueError(f"no MOT sequences under {data_root}")
    stats = {}
    for seq in dataset:
        dpath = det_cache_path(cache_root, detector, seq.name)
        dets_per_frame = seq.dets_per_frame()
        n_total = sum(len(d) for d in dets_per_frame)

        writer = AppendableNpyWriter(dpath, 7)
        if writer.rows < n_total:
            # resume: replay rows from the first incomplete frame
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
        stats[seq.name] = {"dets": n_total, "embs": 0}

        if reid_model is not None:
            from boxmot_tpu.data.frame_cache import FrameCache

            rname = reid_name or getattr(reid_model, "model_name", "reid")
            epath = emb_cache_path(cache_root, detector, rname, seq.name, preprocess)
            feat = reid_model.feature_dim
            ew = AppendableNpyWriter(epath, 1 + feat)
            # Preload frames only when embedding work remains — an
            # idempotent re-run must not pay a full-sequence decode.
            cache = (
                FrameCache(list(seq.img_paths), fallback=load_frame)
                if frame_cache and ew.rows < n_total
                else None
            )
            read = cache.read_image if cache is not None else load_frame
            done_rows = ew.rows
            acc = 0
            for f, d in enumerate(dets_per_frame):
                if len(d) == 0:
                    continue
                if acc + len(d) <= done_rows:
                    acc += len(d)
                    continue
                if f >= len(seq.img_paths):
                    break
                img = read(seq.img_paths[f])
                feats = reid_model.get_features(d[:, :4], img)
                if progress is not None:
                    progress(seq.name, f + 1, len(dets_per_frame))
                start = max(done_rows - acc, 0)
                rows = np.column_stack(
                    [np.full(len(d) - start, f + 1, np.float32), feats[start:]]
                )
                ew.append(rows)
                acc += len(d)
                done_rows = ew.rows
            ew.close()
            if cache is not None:
                cache.clear()
            stats[seq.name]["embs"] = done_rows
        if verbose:
            print(f"generated {seq.name}: {stats[seq.name]}")
    from boxmot_tpu.engine.results import GenerateResult

    return GenerateResult(stats)
