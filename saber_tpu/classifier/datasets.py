"""Zarr-backed classifier datasets + augmentations.

Reference: saber/classifier/datasets/{singleZarrDataset.py,
multiZarrDataset.py, augment.py}. Samples are (image, one
connected-component mask, class label) triplets mined from annotated
zarrs: positive components from ``{run}/labels/0`` (or per-class stacks)
and negatives from ``{run}/labels/rejected``
(singleZarrDataset.py:101-121). Component indexing parallelizes over runs
with a thread pool (the reference uses a ProcessPoolExecutor;
zarrlite reads are GIL-friendly file IO).

Augmentations mirror the reference MONAI pipeline (augment.py:10-39):
adaptive crop to 320², then random rot90 / flips / intensity scale+shift /
contrast / Gaussian noise / smoothing in random order.
"""

import concurrent.futures
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage as ndi

from saber_tpu.classifier.crop import CROP_SIZE, crop_and_resize_adaptive
from saber_tpu.utils import zarrlite


def _index_run(zarr_path: str, run: str) -> List[Tuple[str, str, int, int]]:
    """(run, stack, component_id, label) entries for one run group."""
    root = zarrlite.Group(zarr_path)
    grp = root[run]
    entries = []
    if "labels" not in grp:
        return entries
    labels_grp = grp["labels"]
    for name in labels_grp.keys():
        arr = labels_grp[name]
        label = 0 if name == "rejected" else int(name) + 1
        data = np.asarray(arr[(slice(None),) * arr.ndim])
        stacks = data if data.ndim == 3 else data[None]
        for si in range(stacks.shape[0]):
            comp, n = ndi.label(stacks[si] > 0)
            for ci in range(1, n + 1):
                if np.sum(comp == ci) >= 20:
                    entries.append((run, name, si, ci, label))
    return entries


class ZarrSegmentationDataset:
    """Index + loader over one annotated zarr
    (reference singleZarrDataset.py:9-123)."""

    def __init__(self, zarr_path: str, transform=None, max_workers: int = 4):
        self.zarr_path = zarr_path
        self.transform = transform
        self.root = zarrlite.Group(zarr_path)
        runs = list(self.root.keys())
        self.samples: List[Tuple[str, str, int, int, int]] = []
        with concurrent.futures.ThreadPoolExecutor(max_workers) as ex:
            for entries in ex.map(lambda r: _index_run(zarr_path, r), runs):
                self.samples.extend(entries)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        run, stack_name, si, ci, label = self.samples[idx]
        grp = self.root[run]
        image = np.asarray(grp["0"])
        if image.ndim == 3:
            image = image[0] if image.shape[0] <= 4 else image[si]
        stack = np.asarray(grp["labels"][stack_name])
        plane = stack[si] if stack.ndim == 3 else stack
        comp, _ = ndi.label(plane > 0)
        mask = (comp == ci).astype(np.float32)
        sample = {"image": image.astype(np.float32), "mask": mask,
                  "label": np.int32(label)}
        if self.transform:
            sample = self.transform(sample)
        return sample

    @property
    def num_classes(self) -> int:
        labels = self.root.attrs.get("labels", {})
        if labels:
            return len(labels) + 1  # + background/rejected class 0
        return int(max(s[-1] for s in self.samples)) + 1 if self.samples else 2


class MultiZarrDataset:
    """Concatenation of several zarr datasets (multiZarrDataset.py:8-63)."""

    def __init__(self, zarr_paths: Sequence[str], transform=None):
        self.datasets = [ZarrSegmentationDataset(p, transform) for p in zarr_paths]
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        di = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[di][idx - self._offsets[di]]

    @property
    def num_classes(self):
        return max(d.num_classes for d in self.datasets)


# ---------------------------------------------------------------------------
# Augmentations (reference augment.py:10-39)
# ---------------------------------------------------------------------------

class TrainTransform:
    """Adaptive crop + randomized photometric/geometric augmentations."""

    def __init__(self, crop_size: int = CROP_SIZE, seed: int = 0,
                 augment: bool = True):
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)
        self.augment = augment

    def __call__(self, sample):
        img, mask = crop_and_resize_adaptive(
            sample["image"], sample["mask"], self.crop_size,
            jitter=self.rng if self.augment else None)
        # normalize intensity
        img = (img - img.mean()) / (img.std() + 1e-6)
        if self.augment:
            ops = [self._rot90, self._flip, self._scale_intensity,
                   self._shift_intensity, self._contrast, self._noise,
                   self._smooth]
            self.rng.shuffle(ops)
            for op in ops:
                img, mask = op(img, mask)
        return {"image": img.astype(np.float32),
                "mask": (mask > 0.5).astype(np.float32),
                "label": sample["label"]}

    def _rot90(self, img, mask):
        if self.rng.random() < 0.5:
            k = int(self.rng.integers(1, 4))
            img, mask = np.rot90(img, k).copy(), np.rot90(mask, k).copy()
        return img, mask

    def _flip(self, img, mask):
        if self.rng.random() < 0.5:
            ax = int(self.rng.integers(0, 2))
            img, mask = np.flip(img, ax).copy(), np.flip(mask, ax).copy()
        return img, mask

    def _scale_intensity(self, img, mask):
        if self.rng.random() < 0.3:
            img = img * self.rng.uniform(0.9, 1.1)
        return img, mask

    def _shift_intensity(self, img, mask):
        if self.rng.random() < 0.3:
            img = img + self.rng.uniform(-0.1, 0.1)
        return img, mask

    def _contrast(self, img, mask):
        if self.rng.random() < 0.3:
            g = self.rng.uniform(0.8, 1.25)
            img = np.sign(img) * (np.abs(img) ** g)
        return img, mask

    def _noise(self, img, mask):
        if self.rng.random() < 0.3:
            img = img + self.rng.normal(0, 0.05, img.shape).astype(np.float32)
        return img, mask

    def _smooth(self, img, mask):
        if self.rng.random() < 0.2:
            img = ndi.gaussian_filter(img, self.rng.uniform(0.5, 1.2))
        return img, mask


class ValTransform(TrainTransform):
    def __init__(self, crop_size: int = CROP_SIZE):
        super().__init__(crop_size=crop_size, augment=False)


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True):
    """Minibatch iterator yielding stacked numpy dicts."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = n - (n % batch_size) if drop_last and n >= batch_size else n
    for i in range(0, end, batch_size):
        idxs = order[i:i + batch_size]
        samples = [dataset[int(j)] for j in idxs]
        yield {
            "image": np.stack([s["image"] for s in samples]),
            "mask": np.stack([s["mask"] for s in samples]),
            "label": np.array([s["label"] for s in samples], np.int32),
        }
