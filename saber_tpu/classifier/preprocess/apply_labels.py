"""Convert GUI annotations into per-class training label stacks
(reference saber/classifier/preprocess/apply_labels.py:11-340 ``labeler``).

Annotation JSON schema (written by the annotation GUIs):
``{run_name: {"accepted": {class_id(str): [mask_index,...]},
             "rejected": [mask_index, ...]}}``
Mask indices refer to planes of the candidate stack ``{run}/labels/0``.
Output zarr: per-run image + ``labels/{class-1}`` stacks (accepted per
class) + ``labels/rejected`` (negative pool), with class-name attrs.
"""

import json
from typing import Dict, Optional

import numpy as np

from saber_tpu.utils import zarrlite


def labeler(input_zarr: str, annotations_json: str,
            output_zarr: str = "labeled_data.zarr",
            class_names: Optional[Dict[str, str]] = None) -> str:
    with open(annotations_json) as f:
        ann = json.load(f)

    src = zarrlite.Group(input_zarr)
    out = zarrlite.open_group(output_zarr, "w")

    all_classes = sorted({int(c) for run_ann in ann.values()
                          for c in run_ann.get("accepted", {})})
    labels_attr = {str(c): (class_names or {}).get(str(c), f"class_{c}")
                   for c in all_classes}
    out.attrs.update({"labels": labels_attr,
                      "amg": dict(src.attrs.get("amg", {}))})

    for run, run_ann in ann.items():
        if run not in src:
            continue
        grp = src[run]
        stack = np.asarray(grp["labels"]["0"])
        if stack.ndim == 2:
            stack = stack[None]
        og = out.create_group(run)
        og.create_dataset("0", data=np.asarray(grp["0"]))
        lab = og.create_group("labels")

        for c in all_classes:
            idxs = [i for i in run_ann.get("accepted", {}).get(str(c), [])
                    if 0 <= i < stack.shape[0]]
            if idxs:
                planes = (stack[idxs] > 0).astype(np.uint8)
                lab.create_dataset(str(c - 1), data=planes)
        rej = [i for i in run_ann.get("rejected", []) if 0 <= i < stack.shape[0]]
        if rej:
            lab.create_dataset("rejected",
                               data=(stack[rej] > 0).astype(np.uint8))
    return output_zarr
