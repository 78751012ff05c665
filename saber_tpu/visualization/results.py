"""Result visualization (reference saber/visualization/results.py).

Matplotlib review artifacts: 3D slice viewer, slab-segmentation PNGs, and
GIF export. Headless-safe (Agg backend when no display).
"""

import os
from typing import List, Optional

import matplotlib
import numpy as np

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _overlay(ax, image, labels, alpha=0.45):
    ax.imshow(image, cmap="gray")
    if labels is not None and np.any(labels):
        masked = np.ma.masked_where(labels == 0, labels)
        ax.imshow(masked, cmap="tab10", alpha=alpha, interpolation="nearest")
    ax.axis("off")


def view_3d_seg(vol: np.ndarray, masks: np.ndarray, fname: Optional[str] = None):
    """Interactive z-slider viewer; headless → 3-panel PNG
    (reference results.py:10-51)."""
    vol = np.asarray(vol)
    masks = np.asarray(masks)
    z = vol.shape[0]
    picks = [z // 4, z // 2, 3 * z // 4]
    fig, axes = plt.subplots(1, 3, figsize=(12, 4.2))
    for ax, zi in zip(axes, picks):
        _overlay(ax, vol[zi], masks[zi])
        ax.set_title(f"z={zi}")
    fig.tight_layout()
    if fname:
        fig.savefig(fname, dpi=120)
        plt.close(fig)
    elif matplotlib.get_backend().lower() == "agg":
        fig.savefig("view_3d_seg.png", dpi=120)
        plt.close(fig)
    else:
        plt.show()


def save_slab_seg(save_run: str, image: np.ndarray, masks: List[dict]):
    """Save the 2D slab segmentation overlay (reference results.py:53-76)."""
    labels = np.zeros(np.asarray(image).shape[:2], np.int32)
    for i, m in enumerate(masks, start=1):
        labels[np.asarray(m["segmentation"], bool)] = i
    fig, axes = plt.subplots(1, 2, figsize=(9, 4.4))
    _overlay(axes[0], image, None)
    _overlay(axes[1], image, labels)
    fig.tight_layout()
    fig.savefig(f"{save_run}.png", dpi=120)
    plt.close(fig)


def export_movie(vol: np.ndarray, masks: np.ndarray, fname: str = "segmentation.gif",
                 fps: int = 8):
    """Animated z-sweep GIF (reference results.py:78-146)."""
    import imageio.v2 as imageio

    vol = np.asarray(vol, np.float32)
    vol = (vol - vol.min()) / (vol.max() - vol.min() + 1e-8)
    frames = []
    cmap = plt.get_cmap("tab10")
    for zi in range(vol.shape[0]):
        rgb = np.repeat(vol[zi][..., None], 3, axis=2)
        lab = np.asarray(masks[zi])
        for lbl in np.unique(lab):
            if lbl == 0:
                continue
            color = np.array(cmap((int(lbl) - 1) % 10)[:3])
            sel = lab == lbl
            rgb[sel] = 0.55 * rgb[sel] + 0.45 * color
        frames.append((rgb * 255).astype(np.uint8))
    imageio.mimsave(fname, frames, duration=int(1000 / fps), loop=0)
    return fname
