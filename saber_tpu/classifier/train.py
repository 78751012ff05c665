"""Classifier train entry (reference saber/classifier/train.py).

Reads class labels + AMG parameters from the training zarr's attrs
(train.py:26-27), builds the requested model family, and trains —
automatically data-parallel over every visible device (the reference
switches to the Fabric/DDP trainer when >1 GPU, train.py:30-31,54-61;
here the mesh trainer covers both cases).
"""

from typing import Optional, Sequence, Union

import jax

from saber_tpu.classifier.datasets import (
    MultiZarrDataset,
    TrainTransform,
    ValTransform,
    ZarrSegmentationDataset,
    batch_iterator,
)
from saber_tpu.classifier.trainer import ClassifierTrainer
from saber_tpu.utils.io import get_metadata


def run(train_zarr: Union[str, Sequence[str]],
        val_zarr: Optional[Union[str, Sequence[str]]] = None,
        model_name: str = "SAM2", sam2_cfg: str = "tiny",
        num_epochs: int = 100, batch_size: int = 16, lr: float = 5e-4,
        results_dir: str = "results", seed: int = 42,
        log_every: int = 10) -> ClassifierTrainer:
    """Train a domain-expert classifier from annotated zarr(s)."""
    def build(paths, transform):
        if isinstance(paths, str):
            return ZarrSegmentationDataset(paths, transform)
        return MultiZarrDataset(list(paths), transform)

    train_ds = build(train_zarr, TrainTransform(seed=seed))
    val_ds = build(val_zarr, ValTransform()) if val_zarr else None

    first = train_zarr if isinstance(train_zarr, str) else train_zarr[0]
    labels, amg_params = get_metadata(first)
    num_classes = train_ds.num_classes

    steps = max(1, len(train_ds) // batch_size)
    trainer = ClassifierTrainer(
        model_name, num_classes, sam2_cfg=sam2_cfg, lr=lr,
        num_epochs=num_epochs, results_dir=results_dir,
        devices=jax.devices() if len(jax.devices()) > 1 else None,
        steps_per_epoch_hint=steps, seed=seed)

    train_loader = lambda: batch_iterator(train_ds, batch_size, seed=seed)
    val_loader = (lambda: batch_iterator(val_ds, batch_size, shuffle=False,
                                         drop_last=False)) if val_ds else None
    trainer.train(train_loader, val_loader, labels=labels,
                  amg_params=amg_params, log_every=log_every)
    return trainer
