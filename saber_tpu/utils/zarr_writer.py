"""Thread-safe Zarr result sink (reference saber/utils/zarr_writer.py).

Layout contract matches the reference (zarr_writer.py:101-160): one group
per run, ``{run}/0`` holds the image, ``{run}/labels/0`` the mask stack,
with OME-NGFF v0.4 multiscale metadata and AMG parameters in group attrs
(zarr_writer.py:185-231). A per-writer lock serializes chunk writes from
the DevicePool's worker threads (the reference uses zarr's
ThreadSynchronizer; zarrlite chunks are whole-file writes, so one lock
suffices).
"""

import threading
from typing import Any, Dict, Optional

import numpy as np

from saber_tpu.utils import zarrlite


class ParallelZarrWriter:
    def __init__(self, zarr_path: str):
        self.zarr_path = zarr_path
        self.root = zarrlite.open_group(zarr_path, mode="a")
        self._lock = threading.Lock()
        self._run_counter = 0

    def add_attributes(self, attributes: Dict[str, Any]):
        """Store global attrs (e.g. AMG params, class labels)."""
        with self._lock:
            self.root.attrs.update(attributes)

    def write(self, run_name: str, image: np.ndarray, masks: np.ndarray,
              pixel_size: Optional[float] = None,
              extra_attrs: Optional[Dict[str, Any]] = None):
        """Write one run's image + label stack (reference :101-160)."""
        image = np.asarray(image)
        masks = np.asarray(masks)
        with self._lock:
            grp = self.root.create_group(str(run_name))
            grp.create_dataset("0", data=image.astype(np.float32))
            labels = grp.create_group("labels")
            labels.create_dataset("0", data=masks)
            attrs = {
                "multiscales": [{
                    "version": "0.4",
                    "name": str(run_name),
                    "axes": [{"name": ax, "type": "space",
                              "unit": "angstrom"}
                             for ax in ("zyx" if image.ndim == 3 else "yx")],
                    "datasets": [{
                        "path": "0",
                        "coordinateTransformations": [{
                            "type": "scale",
                            "scale": [pixel_size or 1.0] * image.ndim}],
                    }],
                }],
            }
            if extra_attrs:
                attrs.update(extra_attrs)
            grp.attrs.update(attrs)
            self._run_counter += 1
        return run_name

    @property
    def num_runs(self) -> int:
        return self._run_counter


_writers: Dict[str, ParallelZarrWriter] = {}
_writers_lock = threading.Lock()


def get_zarr_writer(zarr_path: str) -> ParallelZarrWriter:
    """Process-wide singleton per output path (reference :176-183)."""
    with _writers_lock:
        if zarr_path not in _writers:
            _writers[zarr_path] = ParallelZarrWriter(zarr_path)
        return _writers[zarr_path]
