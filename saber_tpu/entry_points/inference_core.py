"""Core per-run segmentation functions shared by interactive and batch
paths (reference saber/entry_points/inference_core.py:10-153)."""

from typing import Any, Dict, Optional

import numpy as np

from saber_tpu.ops import masks as mask_filters
from saber_tpu.ops.downsample import FourierRescale2D
from saber_tpu.utils import zarr_writer
from saber_tpu.utils.io import read_micrograph
from saber_tpu.utils.runs import LocalRun


def segment_tomogram_core(run: LocalRun, segmenter, output_writer,
                          slab_thickness: int = 10, num_slabs: int = 1,
                          delta_z: int = 30, target_class: int = 1,
                          display_segmentation: bool = False,
                          segmentation_session_id: str = "0",
                          device_id: int = 0,
                          text_prompt: Optional[str] = None) -> Optional[str]:
    """Segment one tomogram run and write the result
    (reference inference_core.py:10-97)."""
    vol, voxel_size = run.get_volume()
    if vol is None:
        return None

    img_name = f"{run.name}-{segmentation_session_id}"
    if num_slabs > 1:
        segment_mask = segmenter.segment(vol, slab_thickness, num_slabs,
                                         delta_z, img_name,
                                         display_segmentation)
    else:
        segment_mask = segmenter.segment(vol, slab_thickness,
                                         text=text_prompt,
                                         target_class=target_class,
                                         save_run=img_name,
                                         display=display_segmentation)
    if segment_mask is None:
        return None

    if not display_segmentation:
        segment_mask = mask_filters.fast_3d_gaussian_smoothing(
            segment_mask, scale=0.05, deviceID=device_id)
        segment_mask = segment_mask.astype(np.uint8)
        output_writer.write(run.name, np.asarray(vol, np.float32),
                            segment_mask, pixel_size=voxel_size)

    segmenter.adapter.inference_state = None
    segmenter._vol_loaded = False
    return run.name


def segment_micrograph_core(path: str, zwriter, segmenter,
                            scale_factor: float = 1.0,
                            target_class: int = 1,
                            use_sliding_window: bool = False,
                            device_id: int = 0,
                            text_prompt: Optional[str] = None) -> Optional[str]:
    """Segment one micrograph file (reference inference_core.py:99-153)."""
    import os

    image, pixel_size = read_micrograph(path)
    image = np.asarray(image, np.float32)
    if scale_factor > 1.0:
        image = FourierRescale2D.run(image, scale_factor)
        if pixel_size:
            pixel_size *= scale_factor

    masks = segmenter.segment(image, target_class=target_class,
                              text=text_prompt, display=False,
                              use_sliding_window=use_sliding_window)
    arr = mask_filters.masks_to_array(masks)
    name = os.path.splitext(os.path.basename(path))[0]
    if arr is not None and arr.size:
        zwriter.write(name, image, arr, pixel_size=pixel_size)
    else:
        zwriter.write(name, image,
                      np.zeros((0, *image.shape), np.uint8),
                      pixel_size=pixel_size)
    return name
