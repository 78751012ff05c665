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


def display_embedding_channel(image: np.ndarray, embed: np.ndarray,
                              index: int, fname: Optional[str] = None):
    """Base image + one embedding channel side by side (reference
    interactive.py:69-88). ``embed``: (H, W, C) NHWC (repo convention) or
    (C, H, W). Saves to ``fname`` when given (headless), else shows."""
    import matplotlib.pyplot as plt

    e = np.asarray(embed)
    chan = e[..., index] if e.shape[-1] < e.shape[0] else e[index]
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].imshow(np.asarray(image), cmap="gray")
    axes[0].set_title("Base Image")
    axes[1].imshow(chan, cmap="viridis")
    axes[1].set_title(f"Embedding Channel {index}")
    for ax in axes:
        ax.axis("off")
    if fname:
        fig.savefig(fname, dpi=110)
        plt.close(fig)
        return fname
    plt.show()
    return fig


def channel_slider(method: str):
    """ipywidgets channel slider matching each feature level's width
    (reference interactive.py:89-96: embed 256 / high_res1 32 /
    high_res2 64)."""
    import ipywidgets as widgets

    ranges = {"embed": (256, 128), "high_res1": (32, 16),
              "high_res2": (64, 32)}
    if method not in ranges:
        raise ValueError(f"Invalid method: {method} - must be one of "
                         "'embed', 'high_res1', 'high_res2'")
    mx, val = ranges[method]
    return widgets.IntSlider(min=0, max=mx, step=1, value=val,
                             description="Channel")


def display_composite_embedding(zfile, run_ids, adapter, index: int,
                                level: str = "embed",
                                fname: Optional[str] = None):
    """Base image + PCA-composite encoder embedding for one run
    (reference display_sam2_composite_embedding, interactive.py:99-121 —
    that version drives the torch predictor's set_image; here the
    saber-tpu adapter encodes and the composite is the 3-PC RGB from
    visualize_patch_features). ``level``: 'embed' (/16 features) or
    'high_res1'/'high_res2' (FPN skips)."""
    import matplotlib.pyplot as plt

    from saber_tpu.visualization.embeddings import visualize_patch_features

    import jax
    import jax.numpy as jnp

    run = run_ids[index]
    image = np.asarray(zfile[run]["image"] if "image" in zfile[run]
                       else zfile[run]["0"]).astype(np.float32)
    model, params = adapter.model, adapter.params
    size = model.config.image_size
    lo, hi = image.min(), image.max()
    norm = (image - lo) / max(hi - lo, 1e-9)
    frame = jnp.asarray(norm)[..., None] * jnp.ones((3,), jnp.float32)
    frame = jax.image.resize(frame, (size, size, 3), method="bilinear")
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    frame = ((frame - mean) / std)[None]
    feats = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=type(model).encode_image))(params, frame)
    if level == "embed":
        fmap = np.asarray(feats["vision_features"], np.float32)[0]
    else:
        fpn = feats["backbone_fpn"]
        fmap = np.asarray(fpn[0 if level == "high_res1" else 1],
                          np.float32)[0]
    composite = visualize_patch_features(fmap)

    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].imshow(image, cmap="gray")
    axes[0].set_title(f"Base Image (Run: {run})")
    axes[1].imshow(composite)
    axes[1].set_title("Embedding Composite")
    for ax in axes:
        ax.axis("off")
    if fname:
        fig.savefig(fname, dpi=110)
        plt.close(fig)
        return fname
    plt.show()
    return fig


def show_dataset(dataset, index: int, fname: Optional[str] = None):
    """One classifier-dataset item: image with its mask tinted by label
    (reference interactive.py:162-180). Accepts items shaped like
    classifier/datasets.py output ({'image': (1|C,H,W) or (H,W,C),
    'mask': ..., 'label': int})."""
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap

    colors = [(1, 0, 0, 0.5), (0, 1, 0, 0.5), (0, 0, 1, 0.5),
              (1, 1, 0, 0.5)]
    item = dataset[index]
    im = np.asarray(item["image"])
    mask = np.asarray(item["mask"])
    if im.ndim == 3:
        im = im[0] if im.shape[0] <= 4 else im[..., 0]
    if mask.ndim == 3:
        mask = mask[0] if mask.shape[0] <= 4 else mask[..., 0]
    value = int(np.asarray(item["label"]).max())
    if mask.max() == 0:
        print("BAD MASK!!")
        return None
    cmap = ListedColormap([(1, 1, 1, 0), colors[value % len(colors)]])
    fig = plt.figure(figsize=(8, 8))
    plt.imshow(im, cmap="gray")
    plt.imshow((mask > 0).astype(np.uint8), cmap=cmap, vmin=0, vmax=1)
    plt.axis("off")
    if fname:
        fig.savefig(fname, dpi=110)
        plt.close(fig)
        return fname
    plt.show()
    return fig


def browse_dataset(dataset):
    """Slider-driven dataset browser (notebook); headless fallback shows
    the first item."""
    try:
        import ipywidgets as widgets
        from IPython.display import display

        slider = widgets.IntSlider(0, 0, len(dataset) - 1,
                                   description="index")
        display(widgets.interactive(lambda i: show_dataset(dataset, i),
                                    i=slider))
    except ImportError:
        show_dataset(dataset, 0, fname="/tmp/saber_dataset_item.png")


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
