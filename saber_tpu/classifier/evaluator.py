"""Test-set evaluation → CSV (reference saber/classifier/evaluator.py)."""

import csv
import os
from typing import Optional

import numpy as np

from saber_tpu.classifier.datasets import ValTransform, ZarrSegmentationDataset, batch_iterator
from saber_tpu.classifier.losses import classification_metrics
from saber_tpu.classifier.predictor import Predictor


def evaluate(test_zarr: str, model_config: str,
             model_weights: Optional[str] = None, batch_size: int = 16,
             output_csv: str = "evaluation.csv") -> dict:
    """Score a test zarr with a trained classifier; write per-class CSV."""
    predictor = Predictor(model_config, model_weights)
    ds = ZarrSegmentationDataset(test_zarr, ValTransform())

    preds, labels = [], []
    for batch in batch_iterator(ds, batch_size, shuffle=False, drop_last=False):
        import jax.numpy as jnp
        p = np.asarray(predictor._forward(
            predictor.params, jnp.asarray(batch["image"]),
            jnp.asarray(batch["mask"])))
        preds.append(np.argmax(p, axis=-1))
        labels.append(batch["label"])
    preds = np.concatenate(preds) if preds else np.zeros(0, int)
    labels = np.concatenate(labels) if labels else np.zeros(0, int)
    metrics = classification_metrics(preds, labels, predictor.num_classes)

    os.makedirs(os.path.dirname(output_csv) or ".", exist_ok=True)
    with open(output_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["class", "precision", "recall", "f1", "fbeta"])
        for c in range(predictor.num_classes):
            writer.writerow([c, metrics["precision"][c], metrics["recall"][c],
                             metrics["f1"][c], metrics["fbeta"][c]])
        writer.writerow(["macro", metrics["macro_precision"],
                         metrics["macro_recall"], metrics["macro_f1"],
                         metrics["macro_fbeta"]])
    return metrics
