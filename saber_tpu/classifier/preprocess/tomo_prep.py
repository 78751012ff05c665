"""Training-data prep from tomograms — "Phase 1" curation
(reference saber/classifier/preprocess/tomo_prep.py:13-178 ``prep3d``):
per-run slab segmentation → candidate mask stack → annotation zarr,
fanned over chips."""

from typing import Optional

import numpy as np

from saber_tpu.ops.masks import masks_to_array
from saber_tpu.parallel.pool import DevicePool
from saber_tpu.segmenters.loaders import tomogram_workflow
from saber_tpu.utils import zarr_writer
from saber_tpu.utils.runs import discover_runs


def prep3d(input: str, output: str = "training_data.zarr",
           voxel_size: Optional[float] = None, sam2_cfg: str = "small",
           slab_thickness: int = 10, z_slice: Optional[int] = None,
           min_mask_area: int = 50, num_devices: Optional[int] = None,
           run_ids: Optional[str] = None):
    """Generate candidate masks for annotation from tomogram slabs."""
    runs = discover_runs(input, voxel_size=voxel_size, run_ids=run_ids)
    writer = zarr_writer.get_zarr_writer(output)
    writer.add_attributes({
        "amg": {"sam2_cfg": sam2_cfg},
        "prep": {"slab_thickness": slab_thickness, "voxel_size": voxel_size},
    })

    pool = DevicePool(
        init_fn=lambda i: tomogram_workflow(i, sam2_cfg,
                                            min_mask_area=min_mask_area),
        num_devices=num_devices, verbose=True)

    def work(run, device_id, models):
        seg = models["segmenter"]
        vol, pix = run.get_volume()
        masks = seg.segment_slab(vol, slab_thickness, z_slice, display=False)
        arr = masks_to_array(masks)
        if arr is None or arr.size == 0:
            return None
        writer.write(run.name, np.asarray(seg.image0), arr, pixel_size=pix)
        return run.name

    return pool.execute(work, runs)
