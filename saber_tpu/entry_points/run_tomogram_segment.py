"""`saber segment tomograms` + `slab` — the flagship 3D batch workflow
(reference saber/entry_points/run_tomogram_segment.py:7-357).

Batch runs fan out over all local chips via DevicePool with per-device
segmenter replicas (loaders.tomogram_workflow); a single run id switches
to the interactive branch (reference :208-223)."""

import os
from typing import Optional

import click
import numpy as np

from saber_tpu.entry_points.inference_core import segment_tomogram_core
from saber_tpu.parallel.pool import DevicePool
from saber_tpu.segmenters.loaders import tomogram_workflow
from saber_tpu.utils import zarr_writer
from saber_tpu.utils.io import save_copick_metadata
from saber_tpu.utils.runs import discover_runs
from saber_tpu.visualization.galleries import convert_zarr_to_gallery


def run_tomo_seg(input: str, output: str = "segmentations.zarr",
                 voxel_size: Optional[float] = None, run_ids: Optional[str] = None,
                 sam2_cfg: str = "small", model_config: Optional[str] = None,
                 model_weights: Optional[str] = None, target_class: int = 1,
                 slab_thickness: int = 10, num_slabs: int = 1, delta_z: int = 30,
                 min_mask_area: int = 50, session_id: str = "0",
                 display: bool = False, num_devices: Optional[int] = None,
                 gallery: bool = True, resume: bool = False,
                 max_retries: int = 0, filter_threshold: float = 0.5,
                 text_prompt: Optional[str] = None,
                 parallel_slabs: bool = False,
                 batched_slabs: bool = False):
    """Batch 3D segmentation over all runs in `input`.

    ``resume`` skips runs already present in the output zarr (batch
    checkpoint/resume — absent in the reference, SURVEY.md §5)."""
    runs = discover_runs(input, voxel_size=voxel_size, run_ids=run_ids)
    if not runs:
        raise click.ClickException(f"no runs found in {input}")

    writer = zarr_writer.get_zarr_writer(output)
    if resume:
        done = set(writer.root.keys())
        skipped = [r.name for r in runs if r.name in done]
        runs = [r for r in runs if r.name not in done]
        if skipped:
            print(f"resume: skipping {len(skipped)} completed runs")
        if not runs:
            return {"results": [], "summary": {"total": 0, "succeeded": 0,
                                               "failed": 0, "per_device": {}}}
    save_copick_metadata(os.path.splitext(output)[0] + "_metadata.yaml", {
        "input": input, "voxel_size": voxel_size, "sam2_cfg": sam2_cfg,
        "model_config": model_config, "target_class": target_class,
        "text_prompt": text_prompt,
        "slab_thickness": slab_thickness, "num_slabs": num_slabs,
        "delta_z": delta_z, "session_id": session_id,
    })

    if len(runs) == 1 and (display or parallel_slabs):
        models = tomogram_workflow(0, sam2_cfg, model_config, model_weights,
                                   min_mask_area, num_slabs, target_class,
                                   text_prompt=text_prompt)
        seg = models["segmenter"]
        seg.filter_threshold = filter_threshold
        if batched_slabs and hasattr(seg, "use_batched"):
            seg.use_batched = True
        if parallel_slabs and num_slabs > 1:
            # one tomogram's slab jobs farm over all chips
            # (multiDepthTomoSegmenter.parallel_segment)
            vol, voxel_size = runs[0].get_volume()
            mask = seg.parallel_segment(vol, slab_thickness, num_slabs,
                                        delta_z)
            writer.write(runs[0].name, np.asarray(vol, np.float32),
                         mask.astype(np.uint8), pixel_size=voxel_size)
            if gallery:
                convert_zarr_to_gallery(output)
            return None
        segment_tomogram_core(runs[0], seg, writer,
                              slab_thickness, num_slabs, delta_z,
                              target_class, display_segmentation=display,
                              segmentation_session_id=session_id,
                              text_prompt=text_prompt)
        return None

    pool = DevicePool(
        init_fn=lambda i: tomogram_workflow(
            i, sam2_cfg, model_config, model_weights, min_mask_area,
            num_slabs, target_class, text_prompt=text_prompt),
        num_devices=num_devices, verbose=True, max_retries=max_retries)

    def work(run, device_id, models):
        models["segmenter"].filter_threshold = filter_threshold
        if batched_slabs and hasattr(models["segmenter"], "use_batched"):
            models["segmenter"].use_batched = True
        return segment_tomogram_core(
            run, models["segmenter"], writer, slab_thickness, num_slabs,
            delta_z, target_class, display_segmentation=False,
            segmentation_session_id=session_id, device_id=device_id,
            text_prompt=text_prompt)

    results = pool.execute(work, runs)
    if gallery:
        convert_zarr_to_gallery(output)
    return results


@click.command(name="tomograms")
@click.option("--input", required=True,
              help="MRC directory, zarr, or single tomogram")
@click.option("--output", default="segmentations.zarr", show_default=True)
@click.option("--voxel-size", type=float, default=None,
              help="Fourier-rescale tomograms to this voxel size (Å)")
@click.option("--run-ids", default=None, help="comma-separated run subset")
@click.option("--sam2-cfg", default="small", show_default=True,
              type=click.Choice(["tiny", "small", "base", "large"]))
@click.option("--model-config", default=None,
              help="trained classifier model_config.yaml")
@click.option("--model-weights", default=None)
@click.option("--target-class", default=1, show_default=True)
@click.option("--slab-thickness", default=10, show_default=True)
@click.option("--num-slabs", default=1, show_default=True)
@click.option("--delta-z", default=30, show_default=True)
@click.option("--min-mask-area", default=50, show_default=True)
@click.option("--session-id", default="0", show_default=True)
@click.option("--display", is_flag=True)
@click.option("--num-devices", type=int, default=None)
@click.option("--resume", is_flag=True,
              help="skip runs already present in the output zarr")
@click.option("--max-retries", default=0, show_default=True)
@click.option("--filter-threshold", default=0.5, show_default=True,
              help="min z-presence score to keep a mask on a slice")
@click.option("--text-prompt", default=None,
              help="text concept → SAM3 backend (reference "
                   "run_tomogram_segment.py:36-41)")
@click.option("--parallel-slabs", is_flag=True,
              help="farm one tomogram's slab jobs over all chips "
                   "(single-run, num_slabs > 1)")
@click.option("--batched-slabs", is_flag=True,
              help="batch all slab centers' seeds into one propagation "
                   "scan (encode each slice once; num_slabs > 1)")
def tomograms(**kwargs):
    """Zero-shot / classifier-filtered 3D segmentation of tomograms."""
    run_tomo_seg(**kwargs)


@click.command(name="slab")
@click.option("--input", required=True)
@click.option("--output", default="slab_segmentation.zarr", show_default=True)
@click.option("--voxel-size", type=float, default=None)
@click.option("--run-ids", default=None)
@click.option("--sam2-cfg", default="small", show_default=True,
              type=click.Choice(["tiny", "small", "base", "large"]))
@click.option("--model-config", default=None)
@click.option("--model-weights", default=None)
@click.option("--target-class", default=1, show_default=True)
@click.option("--slab-thickness", default=10, show_default=True)
@click.option("--z-slice", type=int, default=None)
@click.option("--min-mask-area", default=50, show_default=True)
def slab(input, output, voxel_size, run_ids, sam2_cfg, model_config,
         model_weights, target_class, slab_thickness, z_slice, min_mask_area):
    """2D slab-projection segmentation only (no 3D propagation)."""
    from saber_tpu.ops.masks import masks_to_array
    from saber_tpu.segmenters.loaders import tomogram_workflow

    runs = discover_runs(input, voxel_size=voxel_size, run_ids=run_ids)
    writer = zarr_writer.get_zarr_writer(output)
    models = tomogram_workflow(0, sam2_cfg, model_config, model_weights,
                               min_mask_area, 1, target_class)
    seg = models["segmenter"]
    for run in runs:
        vol, pix = run.get_volume()
        masks = seg.segment_slab(vol, slab_thickness, z_slice, display=False,
                                 target_class=target_class)
        arr = masks_to_array(masks)
        if arr is not None and arr.size:
            writer.write(run.name, np.asarray(seg.image0), arr, pixel_size=pix)
    convert_zarr_to_gallery(output)
