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


def sanitize_image_filename(name: str, default: str = "saber_segmentation.png"
                            ) -> str:
    """Reference save-button filename rules (classifier.py:66-82): empty →
    default, unknown extension → append .png."""
    name = (name or "").strip() or default
    if not name.endswith((".png", ".jpg", ".jpeg", ".tiff", ".tif")):
        name += ".png"
    return name


def display_mask_array(image: np.ndarray, masks: np.ndarray,
                       save_button: bool = False,
                       fname: Optional[str] = None):
    """Overlay an integer label map on the image (reference
    classifier.py:31-64). Interactive backends get the reference's
    filename-textbox + save-button workflow; headless (Agg) writes
    ``fname`` (default saber_segmentation.png) directly."""
    from matplotlib.colors import ListedColormap

    masks = np.asarray(masks)
    fig = plt.figure(figsize=(9, 7))
    ax_img = plt.axes([0.1, 0.2, 0.8, 0.75])
    ax_img.imshow(image, cmap="gray")
    nmax = int(masks.max())
    if nmax:
        colors = [plt.cm.tab10(i % 10) for i in range(nmax)]
        ax_img.imshow(masks, cmap=ListedColormap([(1, 1, 1, 0)] + colors),
                      alpha=0.6, interpolation="nearest",
                      vmin=0, vmax=nmax)
    ax_img.axis("off")

    headless = matplotlib.get_backend().lower() == "agg"
    if save_button and not headless:
        from matplotlib.widgets import Button, TextBox
        ax_textbox = plt.axes([0.3, 0.05, 0.5, 0.04])
        textbox = TextBox(ax_textbox, "Filename: ",
                          initial="saber_segmentation.png")
        ax_button = plt.axes([0.75, 0.05, 0.1, 0.04])
        button = Button(ax_button, "Save")
        ax_status = plt.axes([0.86, 0.05, 0.12, 0.04])
        ax_status.axis("off")

        def _save(_event):
            try:
                extent = ax_img.get_window_extent().transformed(
                    fig.dpi_scale_trans.inverted())
                fig.savefig(sanitize_image_filename(textbox.text),
                            bbox_inches=extent.expanded(1.1, 1.1), dpi=300)
                msg, color = "✓ Saved!", "green"
            except Exception:
                msg, color = "Error!", "red"
            ax_status.clear()
            ax_status.text(0, 0.5, msg, transform=ax_status.transAxes,
                           color=color, verticalalignment="center")
            ax_status.axis("off")
            fig.canvas.draw()

        button.on_clicked(_save)
    if headless:
        fig.savefig(sanitize_image_filename(fname or ""), dpi=120)
        plt.close(fig)
    else:
        plt.show()
    return fig


def plot_all_metrics(metrics: dict, save_path: Optional[str] = None):
    """Train/val curves for every metric, one row each (reference
    classifier.py:162-229). ``metrics`` = {"train": {name: [...]},
    "val": {name: [...]}}."""
    names = list(metrics["train"].keys())
    fig, axs = plt.subplots(len(names), 1, figsize=(9, 2 * len(names)),
                            squeeze=False)
    epochs = np.arange(1, max(len(v) for v in metrics["train"].values()) + 1)
    for i, name in enumerate(names):
        ax = axs[i, 0]
        if len(metrics["train"][name]):
            ax.plot(epochs[:len(metrics["train"][name])],
                    metrics["train"][name], label="Training",
                    marker="o", linestyle="-")
        if name in metrics.get("val", {}) and len(metrics["val"][name]):
            ax.plot(epochs[:len(metrics["val"][name])], metrics["val"][name],
                    label="Validation", marker="s", linestyle="--")
        ax.set_ylabel(name)
        ax.grid(True)
        if len(epochs):
            ax.set_xlim(1, epochs[-1])
        if i == len(names) - 1:
            ax.set_xlabel("Epochs")
            ax.legend()
        else:
            ax.set_xticklabels([])
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
    return fig


def plot_per_class_metrics(per_class_results: dict,
                           save_path: Optional[str] = None):
    """Per-class precision/recall/F1 curves in a (metric × train/val)
    grid, background class "class0" skipped (reference
    classifier.py:230-307)."""
    some_class = next(iter(per_class_results["train"].values()))
    metric_names = list(some_class.keys())
    sample = None
    for cls_key, m in per_class_results["train"].items():
        if cls_key != "class0":
            sample = m[metric_names[0]]
            break
    if not sample:
        return None
    epochs = np.arange(1, len(sample) + 1)
    fig, axs = plt.subplots(len(metric_names), 2,
                            figsize=(12, 3 * len(metric_names)),
                            squeeze=False)
    for i, metric in enumerate(metric_names):
        for j, mode in enumerate(("train", "val")):
            ax = axs[i, j]
            for cls_key, m in per_class_results.get(mode, {}).items():
                if cls_key == "class0" or not len(m.get(metric, [])):
                    continue
                ax.plot(epochs[:len(m[metric])], m[metric], label=cls_key,
                        marker="o", linestyle="-")
            if i == len(metric_names) - 1:
                ax.set_xlabel("Epochs")
                ax.legend()
            else:
                ax.set_xticklabels([])
            if len(epochs):
                ax.set_xlim(1, epochs[-1])
            ax.set_ylim(0.0, 1)
            if i == 0:
                ax.set_title(mode)
            if j == 0:
                ax.set_ylabel(metric)
            ax.grid(True)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
    return fig


def masks_to_3d_array(masks: List[dict]) -> np.ndarray:
    """Mask-dict list → (N, H, W) bool stack (reference
    classifier.py:121-133)."""
    if not masks:
        return np.zeros((0, 0, 0), bool)
    return np.stack([np.asarray(m["segmentation"], bool) for m in masks])


def _mask_colors():
    """TAB10 cycle, derived from the canonical GUI palette so overlays
    can never drift from it (reference get_colors:309-342)."""
    from saber_tpu.gui.base.annotation_session import TAB10
    return [tuple(c) for c in np.asarray(TAB10, np.float64) / 255.0]


def add_masks(masks: np.ndarray, ax, alpha: float = 0.6):
    """Overlay a (N, H, W) mask stack on an axis, one cycled color per
    mask (reference classifier.py add_masks:344-362)."""
    from matplotlib.colors import ListedColormap
    masks = np.asarray(masks)
    colors = _mask_colors()
    for i in range(masks.shape[0]):
        color = colors[i % len(colors)]
        cmap = ListedColormap([(1, 1, 1, 0), color])
        ax.imshow(masks[i] > 0, cmap=cmap, alpha=alpha,
                  interpolation="nearest")
    ax.axis("off")


def display_masks(im: np.ndarray, masks: np.ndarray,
                  masks2: Optional[np.ndarray] = None,
                  title: Optional[str] = None,
                  fname: Optional[str] = None):
    """Side-by-side compare of two mask sets over the same grayscale
    image — left shows ``masks2`` (e.g. before / ground truth), right
    shows ``masks`` (reference classifier.py display_masks:365-383)."""
    fig, ax = plt.subplots(1, 2, figsize=(10, 5))
    for a in ax:
        a.imshow(im, cmap="gray")
        a.axis("off")
    if masks2 is not None:
        add_masks(masks2, ax[0])
    add_masks(masks, ax[1])
    if title is not None:
        fig.suptitle(title, fontsize=14)
    fig.tight_layout()
    if fname is None and matplotlib.get_backend().lower() == "agg":
        fname = "display_masks.png"
    if fname:
        fig.savefig(fname, dpi=110)
        plt.close(fig)
    else:
        plt.show()
    return fname
