"""Notebook embedding browsers (reference saber/visualization/interactive.py:180).

ipywidgets-based run/slice browsers for exploratory work; gated on
ipywidgets (optional). Headless fallback renders a static panel grid.
"""

from typing import Optional

import numpy as np


def browse_runs(zarr_path: str, max_masks: int = 32):
    """Interactive run browser over a results zarr (notebook use)."""
    from saber_tpu.utils import zarrlite

    root = zarrlite.Group(zarr_path)
    runs = list(root.keys())

    def _show(run, z=None):
        from saber_tpu.visualization.galleries import create_png_gallery
        grp = root[run]
        img = np.asarray(grp["0"])
        lab = None
        if "labels" in grp and "0" in grp["labels"]:
            lab = np.asarray(grp["labels"]["0"])
        if img.ndim == 3:
            zi = z if z is not None else img.shape[0] // 2
            img = img[zi]
            if lab is not None and lab.ndim == 3:
                lab = lab[zi]
        elif lab is not None and lab.ndim == 3:
            lab = lab.max(axis=0)
        create_png_gallery([img], [lab], [run], output_dir="/tmp/saber_browse",
                           per_page=1)

    try:
        import ipywidgets as widgets
        from IPython.display import display

        dropdown = widgets.Dropdown(options=runs, description="run")
        out = widgets.interactive(lambda run: _show(run), run=dropdown)
        display(out)
        return out
    except ImportError:
        for run in runs[:4]:
            _show(run)
        return runs


def view_volume(vol: np.ndarray, masks: Optional[np.ndarray] = None):
    """z-slider volume viewer (notebook) with headless PNG fallback."""
    try:
        import ipywidgets as widgets
        from IPython.display import display
        import matplotlib.pyplot as plt

        def show(z):
            fig, ax = plt.subplots(figsize=(5, 5))
            ax.imshow(vol[z], cmap="gray")
            if masks is not None and np.any(masks[z]):
                m = np.ma.masked_where(masks[z] == 0, masks[z])
                ax.imshow(m, cmap="tab10", alpha=0.45)
            ax.axis("off")
            plt.show()

        slider = widgets.IntSlider(0, 0, vol.shape[0] - 1, description="z")
        display(widgets.interactive(show, z=slider))
    except ImportError:
        from saber_tpu.visualization.results import view_3d_seg
        view_3d_seg(vol, masks if masks is not None
                    else np.zeros_like(vol, np.uint8))
