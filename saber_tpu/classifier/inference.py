"""Batch classifier scoring of annotated zarrs
(reference saber/classifier/inference.py:29-109 ``predict``)."""

from typing import Optional

import numpy as np

from saber_tpu.classifier.predictor import Predictor
from saber_tpu.ops.masks import convert_predictions_to_masks, masks_to_list
from saber_tpu.utils import zarrlite


def predict(input_zarr: str, model_config: str,
            model_weights: Optional[str] = None, output_zarr: str = "predictions.zarr",
            target_class: Optional[int] = None, batch_size: int = 32,
            min_mask_area: int = 100) -> str:
    """Score every run's candidate masks; write per-class merged label
    stacks to a new zarr."""
    predictor = Predictor(model_config, model_weights)
    src = zarrlite.open_group(input_zarr, "r")
    dst = zarrlite.open_group(output_zarr, "w")
    dst.attrs.update(dict(src.attrs))

    for run in src.keys():
        grp = src[run]
        if "labels" not in grp or "0" not in grp["labels"]:
            continue
        image = np.asarray(grp["0"])
        if image.ndim == 3:
            image = image[0]
        stack = np.asarray(grp["labels"]["0"])
        mask_list = masks_to_list(stack if stack.ndim == 2 else stack.max(0))
        mask_list = [m for m in mask_list if m["area"] >= min_mask_area
                     and m["segmentation"].any()]
        if not mask_list:
            continue
        masks_u8 = np.stack([m["segmentation"].astype(np.uint8)
                             for m in mask_list])
        probs = predictor.batch_predict(image, masks_u8, batch_size)
        routed = convert_predictions_to_masks(
            probs, mask_list, desired_class=target_class,
            min_mask_area=min_mask_area)

        out_run = dst.create_group(run)
        out_run.create_dataset("0", data=image.astype(np.float32))
        out_labels = out_run.create_group("labels")
        if isinstance(routed, list) and routed:
            lab = np.zeros(image.shape, np.uint8)
            for i, m in enumerate(routed, start=1):
                cls = m.get("label", i)
                lab[np.asarray(m["segmentation"], bool)] = cls
            out_labels.create_dataset("0", data=lab)
    return output_zarr
