"""Small path / CLI / device utilities.

Mirrors the reference's utility surface (boxmot/utils/misc.py:13-149 and
boxmot/utils/torch_utils.py:12-50) with JAX-flavored device reporting in
place of the torch CUDA helpers.
"""

from __future__ import annotations

import sys
import threading
from pathlib import Path

from boxmot_tpu.utils.logging import LOGGER

WEIGHTS_DIR = Path("models")


def parse_imgsz(value):
    """Normalize an image-size spec: int / "640" -> 640 (square),
    "H,W" or "H W" or a 2-sequence -> (H, W).  None passes through."""
    if value is None:
        return None
    if isinstance(value, int):
        return value
    if isinstance(value, (tuple, list)):
        vals = [int(v) for v in value]
    else:
        vals = [int(p) for p in str(value).replace(",", " ").split()]
    if len(vals) == 1:
        return vals[0]
    if len(vals) == 2:
        return (vals[0], vals[1])
    raise ValueError(f"invalid imgsz spec: {value!r} (want N or H,W)")


def resolve_model_path(model_path, default_dir: Path = WEIGHTS_DIR) -> Path:
    """Keep explicit paths as-is; fall back to the weights directory for
    bare file names; resolve case-insensitive sibling matches."""
    path = Path(model_path)
    candidates = [path]
    if not path.is_absolute() and path.parent == Path("."):
        candidates.append(Path(default_dir) / path.name)
    for cand in candidates:
        if cand.exists():
            return cand
    for cand in candidates:
        if not cand.parent.exists():
            continue
        wanted = cand.name.lower()
        for sibling in cand.parent.iterdir():
            if sibling.name.lower() == wanted:
                return sibling
    return candidates[-1]


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2 -> runs/exp3 ... (files keep their suffix)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        if path.is_file():
            base, suffix = str(path.with_suffix("")), path.suffix
        else:
            base, suffix = str(path), ""
        for n in range(2, 9999):
            cand = Path(f"{base}{sep}{n}{suffix}")
            if not cand.exists():
                path = cand
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def prompt_overwrite(path_type: str, path, ci: bool = True, timeout: float = 3.0) -> bool:
    """Ask whether to overwrite an existing artifact; non-interactive runs
    (ci=True or no TTY) reuse the existing file without prompting."""
    if ci or not sys.stdin.isatty():
        LOGGER.debug(f"{path_type} {path} already exists; reusing (non-interactive).")
        return False

    print(f"{path_type} {path} already exists. Overwrite? [y/N] ", end="", flush=True)
    answer = []
    got = threading.Event()

    def _read():
        answer.append(sys.stdin.readline().strip().lower())
        got.set()

    t = threading.Thread(target=_read, daemon=True)
    t.start()
    t.join(timeout)
    if not got.is_set():
        print("\nNo response; keeping the existing file.")
        return False
    return answer[0] in ("y", "yes")


def get_system_info() -> dict:
    """Platform + accelerator report (torch_utils.py:12 equivalent,
    reported from the JAX runtime instead of torch.cuda)."""
    import platform

    info = {
        "python": platform.python_version(),
        "platform": platform.platform(),
    }
    try:
        import jax

        devices = jax.devices()
        info.update(
            jax=jax.__version__,
            backend=devices[0].platform if devices else "none",
            device_kind=devices[0].device_kind if devices else "none",
            n_devices=len(devices),
        )
    except Exception as e:  # pragma: no cover - jax is a hard dep in practice
        info["jax"] = f"unavailable ({e})"
    return info


def select_device(device: str = ""):
    """Resolve a device spec to a jax.Device (torch_utils.select_device
    equivalent): "" -> default, "cpu" -> first CPU, "tpu"/"tpu:1" ->
    that accelerator index."""
    import jax

    spec = str(device).strip().lower()
    if not spec:
        return jax.devices()[0]
    name, _, idx = spec.partition(":")
    index = int(idx) if idx else 0
    if name == "cpu":
        pool = jax.devices("cpu")
    else:
        pool = [d for d in jax.devices() if d.platform == name]
        if not pool:
            raise ValueError(
                f"no {name!r} devices available (have: "
                f"{sorted({d.platform for d in jax.devices()})})"
            )
    if index >= len(pool):
        raise ValueError(f"device index {index} out of range for {name!r} ({len(pool)})")
    return pool[index]
