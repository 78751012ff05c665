"""Embedding visualization (reference saber/visualization/embeddings.py:38):
project encoder features to 2D for QC of the feature space."""

import os
from typing import Optional

import matplotlib
import numpy as np

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def visualize_patch_features(features: np.ndarray) -> np.ndarray:
    """(H, W, C) or (C, H, W) patch features → (H, W, 3) PCA composite in
    [0, 1] (reference embeddings.visualize_patch_features consumed by the
    interactive composite browsers, visualization/interactive.py:99-151):
    the three leading principal components of the per-patch feature
    vectors become RGB, each channel min-max normalized."""
    f = np.asarray(features, np.float64)
    if f.ndim != 3:
        raise ValueError(f"expected 3D patch features, got {f.shape}")
    if f.shape[0] > f.shape[-1]:          # (C, H, W) → (H, W, C)
        f = np.moveaxis(f, 0, -1)
    h, w, c = f.shape
    flat = f.reshape(h * w, c)
    flat = flat - flat.mean(axis=0)
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:3].T                # (HW, 3)
    lo = proj.min(axis=0)
    span = np.maximum(proj.max(axis=0) - lo, 1e-9)
    return ((proj - lo) / span).reshape(h, w, 3).astype(np.float32)


def plot_embeddings(features: np.ndarray, labels: Optional[np.ndarray] = None,
                    fname: str = "embeddings.png", method: str = "pca"):
    """(N, D) features → 2D scatter colored by label (PCA; no sklearn
    dependency needed for the default path)."""
    x = np.asarray(features, np.float64)
    x = x - x.mean(axis=0)
    if method == "pca" or True:
        _, _, vt = np.linalg.svd(x, full_matrices=False)
        proj = x @ vt[:2].T
    fig, ax = plt.subplots(figsize=(5.5, 5))
    c = labels if labels is not None else "tab:blue"
    sc = ax.scatter(proj[:, 0], proj[:, 1], c=c, cmap="tab10", s=14,
                    alpha=0.8)
    if labels is not None:
        fig.colorbar(sc, ax=ax, shrink=0.8)
    ax.set_xlabel("PC1")
    ax.set_ylabel("PC2")
    fig.tight_layout()
    fig.savefig(fname, dpi=120)
    plt.close(fig)
    return fname
