"""Volume ingestion (reference saber/utils/importers.py:12-76
``run_from_mrcs``): import a directory of MRC tomograms into a project
store (our zarr layout; copick writers when the package exists), with
optional Fourier rescaling to a target voxel size."""

import glob
import os
from typing import Optional

import numpy as np

from saber_tpu.ops.downsample import FourierRescale3D
from saber_tpu.utils.io import read_mrc
from saber_tpu.utils.zarr_writer import get_zarr_writer


def run_from_mrcs(mrcs_path: str, project: str = "project.zarr",
                  input_voxel_size: Optional[float] = None,
                  output_voxel_size: Optional[float] = None) -> int:
    """Import every MRC under ``mrcs_path`` into ``project``.

    Returns the number of imported runs.
    """
    files = sorted(glob.glob(os.path.join(mrcs_path, "*.mrc")) +
                   glob.glob(os.path.join(mrcs_path, "*.rec")))
    if not files:
        raise FileNotFoundError(f"no MRC files under {mrcs_path}")

    writer = get_zarr_writer(project)
    rescaler = None
    if output_voxel_size is not None:
        in_vs = input_voxel_size
        # per-file header voxel size is used when not given explicitly
    count = 0
    for f in files:
        vol, pix = read_mrc(f)
        vol = vol.astype(np.float32)
        vs = input_voxel_size or pix
        if output_voxel_size is not None and output_voxel_size > vs:
            vol = FourierRescale3D(vs, output_voxel_size).run(vol)
            vs = output_voxel_size
        name = os.path.splitext(os.path.basename(f))[0]
        writer.write(name, vol, np.zeros((0, 1, 1), np.uint8), pixel_size=vs)
        count += 1
    return count
