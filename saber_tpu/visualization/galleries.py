"""Paginated PNG galleries — the batch QC path
(reference saber/visualization/galleries.py:137 convert_zarr_to_gallery;
called at the end of every batch workflow, run_tomogram_segment.py:281-283).
"""

import math
import os
from typing import List, Optional

import matplotlib
import numpy as np

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from saber_tpu.utils import zarrlite


def _panel(ax, image, labels):
    img = np.asarray(image, np.float32)
    lo, hi = np.percentile(img, [1, 99])
    ax.imshow(np.clip(img, lo, hi), cmap="gray")
    if labels is not None and np.any(labels):
        masked = np.ma.masked_where(labels == 0, labels)
        ax.imshow(masked, cmap="tab10", alpha=0.4, interpolation="nearest")
    ax.axis("off")


def create_png_gallery(images: List[np.ndarray],
                       labels: Optional[List[np.ndarray]] = None,
                       names: Optional[List[str]] = None,
                       output_dir: str = "gallery", per_page: int = 16):
    """Tile images (+ label overlays) into paginated PNG sheets."""
    os.makedirs(output_dir, exist_ok=True)
    n = len(images)
    pages = max(1, math.ceil(n / per_page))
    cols = 4
    written = []
    for p in range(pages):
        chunk = list(range(p * per_page, min((p + 1) * per_page, n)))
        rows = max(1, math.ceil(len(chunk) / cols))
        fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 3.2 * rows))
        axes = np.atleast_1d(axes).ravel()
        for ax in axes:
            ax.axis("off")
        for ax, i in zip(axes, chunk):
            _panel(ax, images[i], labels[i] if labels else None)
            if names:
                ax.set_title(names[i], fontsize=8)
        fig.tight_layout()
        out = os.path.join(output_dir, f"gallery_{p:03d}.png")
        fig.savefig(out, dpi=110)
        plt.close(fig)
        written.append(out)
    return written


def convert_zarr_to_gallery(zarr_path: str, output_dir: Optional[str] = None,
                            per_page: int = 16):
    """Gallery from a results zarr ({run}/0 + {run}/labels/0 layout,
    reference galleries.py:137-207)."""
    if output_dir is None:
        output_dir = os.path.splitext(zarr_path)[0] + "_gallery"
    root = zarrlite.open_group(zarr_path, "r")
    images, labels, names = [], [], []
    for run in root.keys():
        grp = root[run]
        if "0" not in grp:
            continue
        img = np.asarray(grp["0"])
        if img.ndim == 3:  # volume: middle slice
            img = img[img.shape[0] // 2]
        lab = None
        if "labels" in grp and "0" in grp["labels"]:
            lab = np.asarray(grp["labels"]["0"])
            if lab.ndim == 3:
                lab = lab.max(axis=0) if lab.shape[0] < 16 else lab[lab.shape[0] // 2]
        images.append(img)
        labels.append(lab)
        names.append(run)
    if not images:
        return []
    return create_png_gallery(images, labels, names, output_dir, per_page)
