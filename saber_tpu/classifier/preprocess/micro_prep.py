"""Training-data prep from micrographs
(reference saber/classifier/preprocess/micro_prep.py:56-144 ``prep2d``):
glob files (splitting 3D stacks into frames), optional Fourier
downsampling, AMG per frame, annotation zarr output."""

import glob
import os
from typing import List, Optional, Tuple

import numpy as np

from saber_tpu.ops.downsample import FourierRescale2D
from saber_tpu.ops.masks import masks_to_array
from saber_tpu.parallel.pool import DevicePool
from saber_tpu.segmenters.loaders import micrograph_workflow
from saber_tpu.utils import zarr_writer
from saber_tpu.utils.io import read_micrograph, read_mrc


def _expand_stacks(files: List[str]) -> List[Tuple[str, Optional[int]]]:
    """3D stacks contribute one task per frame (reference :97-106)."""
    tasks = []
    for f in files:
        if f.lower().endswith((".mrcs", ".mrc")):
            try:
                data, _ = read_mrc(f)
                if data.ndim == 3 and data.shape[0] > 1:
                    tasks += [(f, z) for z in range(data.shape[0])]
                    continue
            except Exception:
                pass
        tasks.append((f, None))
    return tasks


def prep2d(input: str, output: str = "training_data.zarr",
           sam2_cfg: str = "small", scale_factor: float = 1.0,
           min_mask_area: int = 50, use_sliding_window: bool = False,
           num_devices: Optional[int] = None):
    files = sorted(glob.glob(input)) if any(c in input for c in "*?[") else (
        sorted(glob.glob(os.path.join(input, "*"))) if os.path.isdir(input)
        else [input])
    files = [f for f in files if os.path.splitext(f)[1].lower() in
             (".mrc", ".mrcs", ".tif", ".tiff", ".png")]
    tasks = _expand_stacks(files)

    writer = zarr_writer.get_zarr_writer(output)
    writer.add_attributes({"amg": {"sam2_cfg": sam2_cfg}})

    pool = DevicePool(
        init_fn=lambda i: micrograph_workflow(i, sam2_cfg,
                                              min_mask_area=min_mask_area),
        num_devices=num_devices, verbose=True)

    def work(task, device_id, models):
        path, frame = task
        if frame is not None:
            data, pix = read_mrc(path)
            image = data[frame].astype(np.float32)
            name = f"{os.path.splitext(os.path.basename(path))[0]}_{frame:03d}"
        else:
            image, pix = read_micrograph(path)
            image = np.asarray(image, np.float32)
            name = os.path.splitext(os.path.basename(path))[0]
        if scale_factor > 1.0:
            image = FourierRescale2D.run(image, scale_factor)
        masks = models["segmenter"].segment(
            image, display=False, use_sliding_window=use_sliding_window)
        arr = masks_to_array(masks)
        if arr is None or arr.size == 0:
            return None
        writer.write(name, image, arr, pixel_size=pix)
        return name

    return pool.execute(work, tasks)
