"""SAM2-specific plots (reference saber/visualization/sam2.py:175):
presence-fit curves, point/box prompts, mask displays."""

import os
from typing import Optional

import matplotlib
import numpy as np

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_fit(data: np.ndarray, curve: np.ndarray, fname: Optional[str] = None):
    """Per-mask presence-score data + fitted curve over z
    (reference estimate_thickness plotting path)."""
    fig, ax = plt.subplots(figsize=(6, 3.4))
    z = np.arange(len(data))
    ax.plot(z, data, ".", label="object scores", alpha=0.6)
    ax.plot(z, curve, "-", label="fitted presence")
    ax.set_xlabel("z-slice")
    ax.set_ylabel("score")
    ax.legend()
    fig.tight_layout()
    if fname or matplotlib.get_backend().lower() == "agg":
        fig.savefig(fname or "presence_fit.png", dpi=110)
        plt.close(fig)
    else:
        plt.show()


def show_points(ax, coords: np.ndarray, labels: np.ndarray, marker_size=120):
    coords = np.asarray(coords).reshape(-1, 2)
    labels = np.asarray(labels).reshape(-1)
    pos = coords[labels == 1]
    neg = coords[labels == 0]
    ax.scatter(pos[:, 0], pos[:, 1], color="lime", marker="*", s=marker_size,
               edgecolor="white", linewidth=1)
    ax.scatter(neg[:, 0], neg[:, 1], color="red", marker="*", s=marker_size,
               edgecolor="white", linewidth=1)


def show_box(ax, box):
    x0, y0, x1, y1 = box
    ax.add_patch(plt.Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False,
                               edgecolor="yellow", linewidth=1.5))


def show_mask(ax, mask: np.ndarray, color=None, alpha=0.5):
    mask = np.asarray(mask, bool)
    if color is None:
        color = np.array([0.2, 0.55, 0.95])
    overlay = np.zeros((*mask.shape, 4))
    overlay[mask] = [*color, alpha]
    ax.imshow(overlay)


def display_prompt_prediction(image, mask, points=None, labels=None, box=None,
                              fname: Optional[str] = None):
    """One-figure prompt + prediction display."""
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(image, cmap="gray")
    show_mask(ax, mask)
    if points is not None:
        show_points(ax, points, labels if labels is not None
                    else np.ones(len(points)))
    if box is not None:
        show_box(ax, box)
    ax.axis("off")
    fig.tight_layout()
    if fname or matplotlib.get_backend().lower() == "agg":
        fig.savefig(fname or "prompt_prediction.png", dpi=110)
        plt.close(fig)
    else:
        plt.show()


def plot_frame_scores(data: np.ndarray, curve: np.ndarray,
                      fit_label: str = "fit",
                      fname: Optional[str] = None) -> float:
    """Object-score logits along z with the fitted presence curve and its
    R² (reference visualization/sam2.py plot_frame_scores:5-28 — the
    debug view of the thickness fit). Returns the R² so callers can gate
    on fit quality without re-deriving it."""
    data = np.asarray(data, np.float64)
    curve = np.asarray(curve, np.float64)
    ss_res = float(np.sum((data - curve) ** 2))
    ss_tot = float(np.sum((data - data.mean()) ** 2))
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    fig, ax = plt.subplots(figsize=(6, 3.4))
    ax.plot(data, label="object scores")
    ax.plot(curve, "r--", label=f"{fit_label}, R²={r2:.3f}")
    ax.set_xlim(0, len(data))
    ax.set_xlabel("z-slice")
    ax.set_ylabel("object score logits")
    ax.grid(True)
    ax.tick_params(direction="in", top=True, right=True)
    ax.legend()
    fig.tight_layout()
    if fname or matplotlib.get_backend().lower() == "agg":
        fig.savefig(fname or "frame_scores.png", dpi=110)
        plt.close(fig)
    else:
        plt.show()
    return r2


def show_anns(anns, ax=None, borders: bool = True, seed: int = 0):
    """Composite AMG annotations, largest-area first so small masks stay
    visible, random color per mask with boundary outlines (reference
    visualization/sam2.py show_anns:131-161; boundaries via the repo's
    pure-numpy contour extractor instead of OpenCV)."""
    if len(anns) == 0:
        return None
    from saber_tpu.gui.base.annotation_session import mask_boundary
    anns = sorted(anns, key=lambda a: a["area"], reverse=True)
    h, w = np.asarray(anns[0]["segmentation"]).shape[:2]
    img = np.zeros((h, w, 4), np.float32)
    rng = np.random.default_rng(seed)
    for ann in anns:
        m = np.asarray(ann["segmentation"], bool)
        img[m] = np.concatenate([rng.random(3), [0.5]]).astype(np.float32)
        if borders:
            pts = mask_boundary(m)
            if pts is not None:
                img[pts[:, 0], pts[:, 1]] = (0, 0, 1, 0.8)
    if ax is None:
        ax = plt.gca()
    ax.set_autoscale_on(False)
    ax.imshow(img)
    return img


def show_masks(image, masks, scores, points=None, labels=None, box=None,
               borders: bool = True, fname_prefix: Optional[str] = None):
    """One figure per (mask, score) with optional prompt overlays
    (reference visualization/sam2.py show_masks:103-129). Returns the
    list of written paths in headless mode."""
    paths = []
    masks, scores = list(masks), list(scores)   # tolerate iterators
    for i, (mask, score) in enumerate(zip(masks, scores)):
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.imshow(image, cmap="gray" if np.asarray(image).ndim == 2
                  else None)
        show_mask(ax, np.asarray(mask), alpha=0.5)
        if borders:
            from saber_tpu.gui.base.annotation_session import mask_boundary
            pts = mask_boundary(np.asarray(mask) > 0)
            if pts is not None:
                ax.scatter(pts[:, 1], pts[:, 0], s=1, c="white")
        if points is not None:
            show_points(ax, points, labels if labels is not None
                        else np.ones(len(np.atleast_2d(points))))
        if box is not None:
            show_box(ax, box)
        if len(scores) > 1:
            ax.set_title(f"Mask {i + 1}, Score: {float(score):.3f}")
        ax.axis("off")
        fig.tight_layout()
        if fname_prefix or matplotlib.get_backend().lower() == "agg":
            p = f"{fname_prefix or 'mask'}_{i}.png"
            fig.savefig(p, dpi=110)
            plt.close(fig)
            paths.append(p)
        else:
            plt.show()
    return paths
