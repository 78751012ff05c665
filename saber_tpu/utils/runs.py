"""Run discovery: the data-project boundary.

The reference reads runs from Copick projects (copick.from_file +
copick_utils readers, entry_points/inference_core.py:77-84). Copick is not
available in this image, so runs come from local sources with the same
(run.name, volume) contract; a Copick adapter slots in when the package
exists:

- a directory of ``.mrc`` tomograms (one run per file)
- a results/annotation zarr ({run}/0 layout)
- a single volume file
- a copick config json (gated on the copick package)
"""

import glob
import os
from typing import List, Optional, Tuple

import numpy as np

from saber_tpu.utils import zarrlite
from saber_tpu.utils.io import read_tomogram


class LocalRun:
    """A (name, lazily-loaded volume) pair."""

    def __init__(self, name: str, path: str, kind: str,
                 voxel_size: Optional[float] = None):
        self.name = name
        self.path = path
        self.kind = kind
        self.voxel_size = voxel_size

    def get_volume(self) -> Tuple[np.ndarray, float]:
        if self.kind == "mrc":
            return read_tomogram(self.path, self.voxel_size)
        if self.kind == "zarr":
            grp = zarrlite.Group(self.path)
            vol = np.asarray(grp["0"])
            scale = 1.0
            ms = grp.attrs.get("multiscales")
            if ms:
                try:
                    scale = float(ms[0]["datasets"][0]
                                  ["coordinateTransformations"][0]["scale"][0])
                except (KeyError, IndexError, TypeError):
                    pass
            return vol, scale
        raise ValueError(f"unknown run kind {self.kind}")

    def __repr__(self):
        return f"LocalRun({self.name!r}, {self.kind})"


def discover_runs(source: str, voxel_size: Optional[float] = None,
                  run_ids: Optional[str] = None) -> List[LocalRun]:
    """Enumerate runs from a directory/zarr/file source.

    run_ids: optional comma-separated subset filter (the reference's
    single-run interactive branch keys off exactly one id,
    run_tomogram_segment.py:208-223).
    """
    runs: List[LocalRun] = []
    if os.path.isdir(source) and os.path.exists(os.path.join(source, ".zgroup")):
        root = zarrlite.Group(source)
        for name in root.keys():
            runs.append(LocalRun(name, os.path.join(source, name), "zarr",
                                 voxel_size))
    elif os.path.isdir(source):
        for f in sorted(glob.glob(os.path.join(source, "*.mrc")) +
                        glob.glob(os.path.join(source, "*.rec")) +
                        glob.glob(os.path.join(source, "*.map"))):
            name = os.path.splitext(os.path.basename(f))[0]
            runs.append(LocalRun(name, f, "mrc", voxel_size))
    elif source.endswith(".json"):
        try:
            import copick  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "copick project configs need the copick package, which is "
                "not available in this environment; point --input at a "
                "directory of MRC files or a zarr instead.") from e
    elif os.path.isfile(source):
        name = os.path.splitext(os.path.basename(source))[0]
        runs.append(LocalRun(name, source, "mrc", voxel_size))
    else:
        raise FileNotFoundError(source)

    if run_ids:
        wanted = {r.strip() for r in run_ids.split(",")}
        runs = [r for r in runs if r.name in wanted]
    return runs
