"""Tracker hyperparameter tuning.

TPU-native replacement for the reference Ray-Tune orchestration
(boxmot/engine/tuning/tuner.py:169-733 + search_space.py:140): the
objective replays cached detections through the jitted on-device replay
— a full benchmark pass takes milliseconds once compiled — and trials
run concurrently in suggestion-ordered batches (``n_workers``) without
any cluster machinery: a thread pool is enough because distinct trial
configs compile concurrently (XLA compilation releases the GIL), the
device replays dispatch thread-safely, and the native cores release the
GIL inside update.  Search spaces come from the same per-tracker YAML
specs that provide runtime defaults.

Supported samplers (search_space.py yaml_to_tune_space parity):
uniform, loguniform, qrandint (quantized int range), choice, grid_search.
Search strategy is pluggable (``backend="random"|"grid"|"tpe"``, see
backends.py — the TPE backend plays the role of the reference's optuna
sampler).  Trial history persists to trials.json so runs are resumable.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from boxmot_tpu.configs import flatten_config, load_tracker_config

from .backends import create_backend, sample_param


def sample_config(specs: dict, rng: np.random.Generator) -> dict:
    return {k: sample_param(v, rng) for k, v in specs.items()}


def default_objective(metrics: dict) -> float:
    """Combined objective (reference research/tuning convention: HOTA
    primary with MOTA/IDF1 support)."""
    return float(metrics["HOTA"] + 0.5 * metrics["MOTA"] + 0.5 * metrics["IDF1"])


class Tuner:
    def __init__(
        self,
        data_root: Path,
        tracker_type: str,
        base_params: dict | None = None,
        search_space: dict | None = None,
        objective=default_objective,
        work_dir: Path | None = None,
        seed: int = 0,
        eval_kwargs: dict | None = None,
        backend: str = "random",
        backend_kwargs: dict | None = None,
        trial_callback=None,
    ):
        self.data_root = Path(data_root)
        self.tracker_type = tracker_type
        self.base_params = dict(base_params or {})
        # "name:cpp" tunes over the native cores; the search space comes
        # from the plain tracker name
        from boxmot_tpu.trackers.zoo import parse_tracker_spec

        from boxmot_tpu.configs import flatten_specs

        base_name, _ = parse_tracker_spec(tracker_type)
        self.specs = flatten_specs(search_space or load_tracker_config(base_name))
        self.objective = objective
        self.work_dir = Path(work_dir) if work_dir else None
        self.rng = np.random.default_rng(seed)
        self.eval_kwargs = dict(eval_kwargs or {})
        self.backend = create_backend(
            backend, self.specs, seed=seed, **(backend_kwargs or {})
        )
        self.trial_callback = trial_callback
        self.trials: list[dict] = []
        if self.work_dir:
            self.work_dir.mkdir(parents=True, exist_ok=True)
            log = self.work_dir / "trials.json"
            if log.exists():
                self.trials = json.loads(log.read_text())

    def _save(self):
        if self.work_dir:
            (self.work_dir / "trials.json").write_text(json.dumps(self.trials, indent=1))

    def _evaluate(self, params: dict) -> dict:
        from boxmot_tpu.engine.eval import run_eval

        res = run_eval(
            self.data_root,
            self.tracker_type,
            tracker_params={**self.base_params, **params},
            **self.eval_kwargs,
        )
        c = res["combined"]
        return {
            "HOTA": float(c["HOTA"]),
            "MOTA": float(c["MOTA"]),
            "IDF1": float(c["IDF1"]),
        }

    def _measure(self, params: dict) -> dict:
        """Evaluate one config; returns an unindexed trial record.  Safe
        to call concurrently: the device replay dispatches are thread-safe
        and the native cores release the GIL inside update."""
        t0 = time.perf_counter()
        try:
            metrics = self._evaluate(params)
            score = self.objective(metrics)
            error = None
        except Exception as exc:  # failed trial is recorded, not fatal
            metrics, score, error = {}, float("-inf"), str(exc)
        return {
            "params": params,
            "metrics": metrics,
            "score": score,
            "error": error,
            "seconds": round(time.perf_counter() - t0, 2),
        }

    def _record(self, rec: dict) -> None:
        rec["index"] = len(self.trials)
        self.trials.append(rec)
        self._save()
        if self.trial_callback is not None:
            self.trial_callback(rec)

    def _run_trial(self, params: dict) -> None:
        self._record(self._measure(params))

    def _suggest_batch(self, want: int, done: set) -> list[dict]:
        """Draw up to `want` fresh configs from the backend.  Suggestions
        are drawn serially on the caller's thread (adaptive backends see
        history up to the previous completed batch — the standard
        batch-synchronous compromise, matching Ray Tune's concurrent
        sampling; reference tuner.py:216)."""
        batch, stalls = [], 0
        while len(batch) < want and stalls < 50:
            params = self.backend.suggest(self.trials)
            if params is None:  # grid exhausted
                break
            key = json.dumps(params, sort_keys=True)
            if key in done:
                # duplicate suggestion from a stochastic backend: skip it
                # but guarantee progress with a fresh random draw
                params = sample_config(self.specs, self.rng)
                key = json.dumps(params, sort_keys=True)
                if key in done:
                    stalls += 1  # small discrete space may be exhausted
                    continue
            stalls = 0
            done.add(key)
            batch.append(params)
        return batch

    def fit(
        self, n_trials: int = 20, include_default: bool = True, n_workers: int = 1
    ) -> dict:
        """Run trials (resuming any persisted history); returns the best.

        The backend sees the accumulated history on every suggestion, so
        adaptive strategies (tpe) exploit earlier trials — including ones
        restored from a previous run.  ``n_workers > 1`` evaluates trials
        concurrently in batches (the reference parallelizes trials via
        Ray, tuner.py:216,733); results are recorded in suggestion order,
        so trials.json and resume behave identically to a serial run of
        the same suggestion sequence.
        """
        done = {json.dumps(t["params"], sort_keys=True) for t in self.trials}
        if include_default and not self.trials:
            defaults = flatten_config(self.specs)
            self._run_trial(defaults)
            done.add(json.dumps(defaults, sort_keys=True))

        n_workers = max(int(n_workers), 1)
        while len(self.trials) < n_trials:
            want = min(n_workers, n_trials - len(self.trials))
            batch = self._suggest_batch(want, done)
            if not batch:
                break
            if len(batch) == 1:
                self._run_trial(batch[0])
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=len(batch)) as pool:
                    recs = list(pool.map(self._measure, batch))
                for rec in recs:  # suggestion order, deterministic
                    self._record(rec)
        return self.best()

    def best(self) -> dict:
        from boxmot_tpu.engine.results import TuneResult

        ok = [t for t in self.trials if t.get("error") is None]
        if not ok:
            raise RuntimeError("no successful trials")
        return TuneResult(max(ok, key=lambda t: t["score"]))

    def trial_results(self) -> list:
        """Typed per-trial results (reference TuneTrialResult surface)."""
        from boxmot_tpu.engine.results import TuneTrialResult

        return [TuneTrialResult(t) for t in self.trials]


def run_tune(
    data_root,
    tracker_type: str = "bytetrack",
    n_trials: int = 20,
    work_dir=None,
    seed: int = 0,
    base_params: dict | None = None,
    eval_kwargs: dict | None = None,
    backend: str = "random",
    trial_callback=None,
    n_workers: int = 1,
) -> dict:
    tuner = Tuner(
        data_root,
        tracker_type,
        base_params=base_params,
        work_dir=work_dir,
        seed=seed,
        eval_kwargs=eval_kwargs,
        backend=backend,
        trial_callback=trial_callback,
    )
    best = tuner.fit(n_trials=n_trials, n_workers=n_workers)
    if work_dir:
        import yaml

        (Path(work_dir) / "best.yaml").write_text(yaml.safe_dump(best["params"]))
    return best
