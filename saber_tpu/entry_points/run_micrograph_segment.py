"""`saber segment micrographs` — 2D batch workflow
(reference saber/entry_points/run_micrograph_segment.py:29-209)."""

import glob
import os
from typing import Optional

import click
import numpy as np

from saber_tpu.entry_points.inference_core import segment_micrograph_core
from saber_tpu.parallel.pool import DevicePool
from saber_tpu.segmenters.loaders import micrograph_workflow
from saber_tpu.utils import zarr_writer
from saber_tpu.visualization.galleries import convert_zarr_to_gallery


def run_micrograph_segment(input: str, output: str = "micrographs.zarr",
                           sam2_cfg: str = "small",
                           model_config: Optional[str] = None,
                           model_weights: Optional[str] = None,
                           target_class: int = 1, scale_factor: float = 1.0,
                           min_mask_area: int = 50,
                           use_sliding_window: bool = False,
                           display: bool = False,
                           num_devices: Optional[int] = None,
                           gallery: bool = True,
                           text_prompt: Optional[str] = None):
    files = sorted(glob.glob(input)) if any(c in input for c in "*?[") else (
        sorted(glob.glob(os.path.join(input, "*"))) if os.path.isdir(input)
        else [input])
    files = [f for f in files if os.path.splitext(f)[1].lower() in
             (".mrc", ".mrcs", ".tif", ".tiff", ".png", ".jpg", ".jpeg",
              ".dm4", ".ser")]
    if not files:
        raise click.ClickException(f"no micrographs match {input}")

    writer = zarr_writer.get_zarr_writer(output)

    if len(files) == 1 and display:
        models = micrograph_workflow(0, sam2_cfg, model_config, model_weights,
                                     min_mask_area, text_prompt=text_prompt)
        from saber_tpu.utils.io import read_micrograph
        image, _ = read_micrograph(files[0])
        models["segmenter"].segment(np.asarray(image, np.float32),
                                    target_class=target_class, display=True,
                                    text=text_prompt,
                                    use_sliding_window=use_sliding_window)
        return None

    pool = DevicePool(
        init_fn=lambda i: micrograph_workflow(
            i, sam2_cfg, model_config, model_weights, min_mask_area,
            text_prompt=text_prompt),
        num_devices=num_devices, verbose=True)

    def work(path, device_id, models):
        return segment_micrograph_core(
            path, writer, models["segmenter"], scale_factor, target_class,
            use_sliding_window, device_id, text_prompt=text_prompt)

    results = pool.execute(work, files)
    if gallery:
        convert_zarr_to_gallery(output)
    return results


@click.command(name="micrographs")
@click.option("--input", required=True, help="glob, directory, or file")
@click.option("--output", default="micrographs.zarr", show_default=True)
@click.option("--sam2-cfg", default="small", show_default=True,
              type=click.Choice(["tiny", "small", "base", "large"]))
@click.option("--model-config", default=None)
@click.option("--model-weights", default=None)
@click.option("--target-class", default=1, show_default=True)
@click.option("--scale-factor", default=1.0, show_default=True,
              help="Fourier downsample factor (>1)")
@click.option("--min-mask-area", default=50, show_default=True)
@click.option("--sliding-window", "use_sliding_window", is_flag=True)
@click.option("--display", is_flag=True)
@click.option("--num-devices", type=int, default=None)
@click.option("--text-prompt", default=None,
              help="text concept → SAM3 backend")
def micrographs(**kwargs):
    """Zero-shot / classifier-filtered 2D segmentation of micrographs."""
    run_micrograph_segment(**kwargs)
