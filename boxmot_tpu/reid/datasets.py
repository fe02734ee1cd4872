"""ReID datasets: Market1501-style indexing, P x K sampling, transforms.

Mirror of boxmot/reid/datasets/ (~1,200 LoC): filename-pattern indexing
(pid_cXsY_...), identity-balanced P x K batch sampling, and the standard
train-time augmentations (pad+random crop, horizontal flip, random
erasing) implemented in numpy so batches arrive device-ready.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_MARKET_RE = re.compile(r"([-\d]+)_c(\d+)")


def _index_market_dir(path: Path, relabel: bool):
    items = []
    for p in sorted(Path(path).glob("*.jpg")):
        m = _MARKET_RE.match(p.name)
        if m is None:
            continue
        pid, cam = int(m.group(1)), int(m.group(2))
        if pid == -1:
            continue  # junk images
        items.append((p, pid, cam - 1))
    if relabel:
        pids = sorted({pid for _, pid, _ in items})
        lut = {p: i for i, p in enumerate(pids)}
        items = [(p, lut[pid], cam) for p, pid, cam in items]
    return items


class Market1501:
    """Market-1501 layout: bounding_box_train / query / bounding_box_test."""

    def __init__(self, root: Path):
        root = Path(root)
        if (root / "Market-1501-v15.09.15").exists():
            root = root / "Market-1501-v15.09.15"
        self.train = _index_market_dir(root / "bounding_box_train", relabel=True)
        self.query = _index_market_dir(root / "query", relabel=False)
        self.gallery = _index_market_dir(root / "bounding_box_test", relabel=False)
        self.num_train_pids = len({pid for _, pid, _ in self.train})


DATASET_REGISTRY = {
    "market1501": Market1501,
}


def load_dataset(name: str, root: Path):
    key = name.strip().lower().replace("-", "")
    if key not in DATASET_REGISTRY:
        raise ValueError(f"unknown reid dataset {name!r}; supported: {sorted(DATASET_REGISTRY)}")
    return DATASET_REGISTRY[key](root)


def load_image(path: Path, hw=(256, 128)) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((hw[1], hw[0]))
    return np.asarray(im, np.float32) / 255.0


def augment(img: np.ndarray, rng: np.random.Generator, pad: int = 10,
            flip_p: float = 0.5, erase_p: float = 0.5) -> np.ndarray:
    """Standard ReID train transforms: pad+crop, flip, random erasing."""
    h, w = img.shape[:2]
    padded = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="constant")
    oy = rng.integers(0, 2 * pad + 1)
    ox = rng.integers(0, 2 * pad + 1)
    img = padded[oy : oy + h, ox : ox + w]
    if rng.uniform() < flip_p:
        img = img[:, ::-1]
    if rng.uniform() < erase_p:
        area = h * w
        for _ in range(10):
            target = rng.uniform(0.02, 0.4) * area
            ratio = rng.uniform(0.3, 3.33)
            eh = int(round(np.sqrt(target * ratio)))
            ew = int(round(np.sqrt(target / ratio)))
            if eh < h and ew < w:
                y = rng.integers(0, h - eh)
                x = rng.integers(0, w - ew)
                img = img.copy()
                img[y : y + eh, x : x + ew] = rng.uniform(0, 1, (eh, ew, 3))
                break
    return np.ascontiguousarray(img)


def standardize(batch: np.ndarray) -> np.ndarray:
    return (batch - IMAGENET_MEAN) / IMAGENET_STD


class PKSampler:
    """Identity-balanced sampler: P identities x K instances per batch
    (reference RandomIdentitySampler semantics)."""

    def __init__(self, items, p: int, k: int, seed: int = 0):
        self.items = items
        self.p = p
        self.k = k
        self.rng = np.random.default_rng(seed)
        self.by_pid = {}
        for i, (_, pid, _) in enumerate(items):
            self.by_pid.setdefault(pid, []).append(i)

    def set_seed(self, seed: int):
        self.rng = np.random.default_rng(seed)

    def sample_batch(self):
        pids = list(self.by_pid)
        p = min(self.p, len(pids))
        chosen = self.rng.choice(len(pids), size=p, replace=False)
        idxs = []
        for ci in chosen:
            pool = self.by_pid[pids[ci]]
            replace = len(pool) < self.k
            idxs.extend(self.rng.choice(pool, size=self.k, replace=replace))
        return idxs


def make_batch(items, idxs, hw=(256, 128), rng=None, train=True):
    imgs, pids = [], []
    for i in idxs:
        path, pid, _ = items[i]
        img = load_image(path, hw)
        if train and rng is not None:
            img = augment(img, rng)
        imgs.append(img)
        pids.append(pid)
    return standardize(np.stack(imgs)), np.asarray(pids, np.int32)
