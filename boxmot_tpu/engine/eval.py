"""Benchmark evaluation workflow: replay cached dets -> MOT txt -> metrics.

Mirror of the reference run_eval orchestration
(boxmot/engine/eval/evaluator.py:307-409) with the TPU-native replay:
sequences are scanned on device (engine/replay.py) and metrics are
computed natively (engine/metrics/mot_metrics.py) instead of shelling
out to the trackeval package.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from boxmot_tpu.data.mot import MOTDataset
from boxmot_tpu.engine.metrics.mot_metrics import (
    evaluate_sequences,
    preprocess_sequence,
)
from boxmot_tpu.engine.mot_io import write_mot_results
from boxmot_tpu.engine.replay import replay_sequence
from boxmot_tpu.trackers.botsort import BotSortConfig
from boxmot_tpu.trackers.bytetrack import ByteTrackConfig
from boxmot_tpu.trackers.ocsort import OcSortConfig
from boxmot_tpu.trackers.sfsort import SFSortConfig
from boxmot_tpu.trackers.deepocsort import DeepOcSortConfig
from boxmot_tpu.trackers.boosttrack import BoostTrackConfig
from boxmot_tpu.trackers.occluboost import OccluBoostConfig
from boxmot_tpu.trackers.strongsort import StrongSortConfig
from boxmot_tpu.trackers.hybridsort import HybridSortConfig

_TRACKER_CONFIGS = {
    "bytetrack": ByteTrackConfig,
    "ocsort": OcSortConfig,
    "botsort": BotSortConfig,
    "sfsort": SFSortConfig,
    "deepocsort": DeepOcSortConfig,
    "boosttrack": BoostTrackConfig,
    "occluboost": OccluBoostConfig,
    "strongsort": StrongSortConfig,
    "hybridsort": HybridSortConfig,
}


def build_replay_config(tracker_type: str, **params):
    """Replay config from the YAML tier + explicit overrides.

    The zoo/native backends consume configs/trackers/<name>.yaml defaults
    (the reference benchmark configurations); the device replay path must
    use the same tier so all backends evaluate identically.  ``with_reid``
    defaults off when the caller provides no embedding source (the
    reference eval always has reid weights for appearance trackers; a
    motion-only replay with constant features is not that configuration).
    """
    try:
        cfg_cls = _TRACKER_CONFIGS[tracker_type]
    except KeyError:
        raise ValueError(
            f"No replay config for tracker {tracker_type!r}; "
            f"available: {sorted(_TRACKER_CONFIGS)}"
        ) from None
    from boxmot_tpu.configs import get_tracker_defaults

    merged = {**get_tracker_defaults(tracker_type), **params}
    fields = {f for f in cfg_cls.__dataclass_fields__}
    return cfg_cls(**{k: v for k, v in merged.items() if k in fields})


def load_kf_noise_params(kf_noise) -> dict:
    """Extract the tracker-config overrides from a tune-kf result
    (motion/calibration.py estimate_kf_noise JSON or dict)."""
    import json

    if not isinstance(kf_noise, dict):
        kf_noise = json.loads(Path(kf_noise).read_text())
    out = {}
    for key in ("std_weight_position", "std_weight_velocity"):
        if key in kf_noise:
            out[key] = float(kf_noise[key])
    return out


def run_eval(
    data_root: Path,
    tracker_type: str = "bytetrack",
    tracker_params: dict | None = None,
    output_dir: Path | None = None,
    min_det_conf: float | None = None,
    cache_root: Path | None = None,
    detector: str = "public",
    reid: str | None = None,
    preprocess: str = "resize",
    postprocessing: str | None = None,
    verbose: bool = False,
    kf_noise=None,
    n_workers: int = 1,
    progress=None,
    cmc_method: str | None = None,
    seq_names=None,
) -> dict:
    """Evaluate a tracker over all sequences under data_root.

    Detections come from each sequence's public det.txt, or — when
    cache_root is given — from generated det/emb caches (the reference's
    replay-from-cache path, engine/eval/replay.py:216-369).  ``kf_noise``
    is a tune-kf JSON path or dict whose calibrated std weights are
    injected into the tracker config (the reference's
    _apply_kf_tuning_to_runtime, engine/eval/replay.py:142).
    ``cmc_method`` replays cached camera-motion warps (generated with
    ``run_generate(..., cmc_method=...)``) through the device programs.
    Returns {"per_seq": {...}, "combined": {...}} metric dicts including
    HOTA, MOTA, IDF1.
    """
    from boxmot_tpu.data.cache import (
        det_cache_path,
        emb_cache_path,
        load_cached_dets_per_frame,
        load_cached_embs_per_frame,
    )

    dataset = MOTDataset(data_root, names=seq_names)
    if len(dataset) == 0:
        raise ValueError(f"no MOT sequences found under {data_root}")
    tracker_params = dict(tracker_params or {})
    if kf_noise is not None:
        tracker_params = {**load_kf_noise_params(kf_noise), **tracker_params}
    # "name:cpp" replays on the native slot-bank cores instead of the
    # device programs (reference --tracker-backend cpp,
    # engine/eval/replay.py:533)
    from boxmot_tpu.trackers.zoo import parse_tracker_spec

    tracker_type, tracker_backend = parse_tracker_spec(tracker_type)
    host_tracker = tracker_type not in _TRACKER_CONFIGS and tracker_backend != "cpp"
    if reid is None and not host_tracker:
        # no embedding cache: appearance terms off (the reference
        # motion-only runs behave the same way, on both backends)
        tracker_params.setdefault("with_reid", False)
    if tracker_backend == "cpp" or host_tracker:
        cfg = None
    else:
        cfg = build_replay_config(tracker_type, **tracker_params)
    def _load(seq):
        embs = None
        # motion-only tracker configs carry no feat_dim; cached embeddings
        # are ignored for them (the reference replay does the same)
        wants_embs = hasattr(cfg, "feat_dim") or tracker_backend == "cpp"
        if cache_root is not None:
            dets = load_cached_dets_per_frame(
                det_cache_path(cache_root, detector, seq.name), seq.seq_length
            )
            if reid is not None and wants_embs:
                embs = load_cached_embs_per_frame(
                    emb_cache_path(cache_root, detector, reid, seq.name, preprocess),
                    seq.seq_length,
                )
        else:
            dets = seq.dets_per_frame()
        if min_det_conf is not None:
            keep = [d[:, 4] >= min_det_conf for d in dets]
            dets = [d[k] for d, k in zip(dets, keep)]
            if embs is not None:
                embs = [e[k] for e, k in zip(embs, keep)]
        warps = None
        if cmc_method and cache_root is not None:
            from boxmot_tpu.data.cache import (
                load_cached_warps_per_frame,
                warp_cache_path,
            )

            wpath = warp_cache_path(cache_root, cmc_method, seq.name)
            if wpath.exists():
                warps = load_cached_warps_per_frame(wpath, seq.seq_length)
        return dets, embs, warps

    def _finish(seq, mot_rows, embs):
        if postprocessing:
            from boxmot_tpu.postprocessing import create_postprocessor

            rows = mot_rows.astype(np.float64)
            for name in filter(None, (n.strip() for n in postprocessing.split(","))):
                pp = create_postprocessor(name)
                if name == "gta":
                    rows = pp(rows, embs_per_frame=embs)
                else:
                    rows = pp(rows)
            mot_rows = rows
        if output_dir is not None:
            write_mot_results(Path(output_dir) / f"{seq.name}.txt", mot_rows)
        entry = preprocess_sequence(
            seq.gt(), mot_rows.astype(np.float64), seq.seq_length
        )
        if verbose:
            print(f"replayed {seq.name}: {len(mot_rows)} track rows")
        return entry

    def _process(seq):
        dets, embs, warps = _load(seq)
        if tracker_backend == "cpp":
            from boxmot_tpu.native.replay import replay_sequence_native

            mot_rows = replay_sequence_native(
                tracker_type, dets, tracker_params, embs_per_frame=embs
            )
        elif host_tracker:
            # Host-side trackers (sam2mot): per-frame update loop; seg
            # masks come from the generate-path mask cache when present
            # (reference replay-from-cache with masks, cache.py:930-943).
            from boxmot_tpu.engine.mot_io import convert_to_mot_format
            from boxmot_tpu.trackers.zoo import create_tracker

            masks_pf = None
            if cache_root is not None:
                from boxmot_tpu.data.cache import (
                    load_cached_masks_per_frame,
                    mask_cache_path,
                )

                mp = mask_cache_path(cache_root, detector, seq.name)
                if mp.exists():
                    masks_pf = load_cached_masks_per_frame(
                        mp, seq.seq_length,
                        (seq.info.im_height, seq.info.im_width),
                    )
            trk = create_tracker(tracker_type, tracker_config=tracker_params)
            img = np.zeros((seq.info.im_height, seq.info.im_width, 3), np.uint8)
            rows = []
            for f, d in enumerate(dets):
                kw = {}
                if masks_pf is not None:
                    kw["masks"] = masks_pf[f]
                out = np.asarray(trk.update(d, img, **kw))
                if len(out):
                    rows.append(convert_to_mot_format(out, frame_idx=f + 1))
            mot_rows = (
                np.concatenate(rows) if rows else np.zeros((0, 9), np.float32)
            )
        else:
            mot_rows = replay_sequence(cfg, dets, embs_per_frame=embs, warps=warps)
        return seq.name, _finish(seq, mot_rows, embs)

    seq_data = {}
    n_total = len(dataset)

    def _advance(name):
        if progress is not None:
            progress(name, len(seq_data), n_total)

    if cfg is not None:
        # Device path: all sequences replay as batched lockstep programs —
        # sequences sharing a (frame, det) bucket vmap together and the
        # sequence axis shards over the chip mesh when >1 device is
        # attached (the role the reference fills with per-sequence
        # thread/process pools, engine/eval/replay.py:372-445).
        from boxmot_tpu.engine.replay import replay_sequences_batched

        inputs, seqs = [], list(dataset)
        for seq in seqs:
            dets, embs, warps = _load(seq)
            inputs.append({"dets": dets, "embs": embs, "warps": warps})
        mot_list = replay_sequences_batched(cfg, inputs)
        for seq, inp, mot_rows in zip(seqs, inputs, mot_list):
            seq_data[seq.name] = _finish(seq, mot_rows, inp["embs"])
            _advance(seq.name)
    elif tracker_backend == "cpp" and n_workers > 1 and len(dataset) > 1:
        # the native cores release the GIL inside bmt_tracker_update, so
        # a thread pool over sequences parallelizes on multi-core hosts
        # (the reference's per-sequence replay pool,
        # engine/eval/replay.py:372-445)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            for name, entry in pool.map(_process, dataset):
                seq_data[name] = entry
                _advance(name)
    else:
        for seq in dataset:
            name, entry = _process(seq)
            seq_data[name] = entry
            _advance(name)
    results = evaluate_sequences(seq_data)
    if verbose:
        c = results["combined"]
        print(
            f"HOTA {100 * c['HOTA']:.2f}  MOTA {100 * c['MOTA']:.2f}  "
            f"IDF1 {100 * c['IDF1']:.2f}"
        )
    from boxmot_tpu.engine.results import ValidationResult

    return ValidationResult(results)
