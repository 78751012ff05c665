"""Classifier/segmentation display helpers
(reference saber/visualization/classifier.py: overlays, metric plots)."""

import os
from typing import List, Optional

import matplotlib
import numpy as np

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def display_mask_list(image: np.ndarray, masks: List[dict],
                      save_button: bool = False,
                      fname: Optional[str] = None):
    """Overlay a mask-dict list on the image (reference classifier.py
    display path). Headless → writes segmentation.png."""
    labels = np.zeros(np.asarray(image).shape[:2], np.int32)
    for i, m in enumerate(masks, start=1):
        labels[np.asarray(m["segmentation"], bool)] = i
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(image, cmap="gray")
    if np.any(labels):
        masked = np.ma.masked_where(labels == 0, labels)
        ax.imshow(masked, cmap="tab10", alpha=0.45, interpolation="nearest")
    ax.axis("off")
    fig.tight_layout()
    if fname is None and matplotlib.get_backend().lower() == "agg":
        fname = "segmentation.png"
    if fname:
        fig.savefig(fname, dpi=120)
        plt.close(fig)
    else:
        plt.show()


def plot_training_metrics(metrics: dict, out_path: str):
    """Loss / F1 curves → PDF (reference trainer.py:234-268 artifacts)."""
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    epochs = np.arange(1, len(metrics.get("train_loss", [])) + 1)
    axes[0].plot(epochs, metrics.get("train_loss", []), label="train")
    if metrics.get("val_loss"):
        axes[0].plot(epochs, metrics["val_loss"], label="val")
    axes[0].set_xlabel("epoch"); axes[0].set_ylabel("loss"); axes[0].legend()
    if metrics.get("val_f1"):
        axes[1].plot(epochs, metrics["val_f1"], label="macro F1")
    axes[1].set_xlabel("epoch"); axes[1].set_ylabel("F1"); axes[1].legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
