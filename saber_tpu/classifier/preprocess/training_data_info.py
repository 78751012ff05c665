"""Dataset summary (reference
saber/classifier/preprocess/training_data_info.py:4-28)."""

import numpy as np

from saber_tpu.utils import zarrlite


def training_data_info(zarr_path: str) -> dict:
    root = zarrlite.Group(zarr_path)
    info = {"runs": 0, "per_class": {}, "labels": dict(root.attrs.get("labels", {}))}
    for run in root.keys():
        grp = root[run]
        if "labels" not in grp:
            continue
        info["runs"] += 1
        for name in grp["labels"].keys():
            arr = np.asarray(grp["labels"][name])
            n = arr.shape[0] if arr.ndim == 3 else 1
            info["per_class"][name] = info["per_class"].get(name, 0) + n
    return info
