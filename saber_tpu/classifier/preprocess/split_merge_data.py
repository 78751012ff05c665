"""Train/val/test splitting and zarr merging
(reference saber/classifier/preprocess/split_merge_data.py:7-272)."""

import concurrent.futures
import os
import shutil
from typing import List, Sequence, Tuple

import numpy as np

from saber_tpu.utils import zarrlite


def _copy_run(src_path: str, dst_root: zarrlite.Group, run: str):
    src = zarrlite.Group(src_path)[run]
    dst = dst_root.create_group(run)
    for key in src.keys():
        item = src[key]
        if isinstance(item, zarrlite.Array):
            dst.create_dataset(key, data=np.asarray(item))
        else:  # nested group (labels)
            sub = dst.create_group(key)
            for k2 in item.keys():
                sub.create_dataset(k2, data=np.asarray(item[k2]))
    dst.attrs.update(dict(src.attrs))


def split_dataset(input_zarr: str, train_ratio: float = 0.8,
                  val_ratio: float = 0.1, seed: int = 42,
                  output_prefix: str = None) -> Tuple[str, str, str]:
    """Random per-run split into train/val/test zarrs (reference uses
    sklearn train_test_split; a seeded permutation is equivalent)."""
    if output_prefix is None:
        output_prefix = os.path.splitext(input_zarr)[0]
    root = zarrlite.Group(input_zarr)
    runs = list(root.keys())
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(runs))
    n_train = int(len(runs) * train_ratio)
    n_val = int(len(runs) * val_ratio)
    splits = {
        f"{output_prefix}_train.zarr": [runs[i] for i in order[:n_train]],
        f"{output_prefix}_val.zarr": [runs[i] for i in order[n_train:n_train + n_val]],
        f"{output_prefix}_test.zarr": [runs[i] for i in order[n_train + n_val:]],
    }
    attrs = dict(root.attrs)
    for path, members in splits.items():
        out = zarrlite.open_group(path, "w")
        out.attrs.update(attrs)
        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            list(ex.map(lambda r: _copy_run(input_zarr, out, r), members))
    return tuple(splits.keys())


def merge_datasets(inputs: Sequence[str], output_zarr: str) -> str:
    """Concatenate several annotation zarrs (run names get a source prefix
    on collision)."""
    out = zarrlite.open_group(output_zarr, "w")
    seen = set()
    for src_path in inputs:
        src = zarrlite.Group(src_path)
        out.attrs.update(dict(src.attrs))
        tag = os.path.splitext(os.path.basename(src_path))[0]
        for run in src.keys():
            name = run if run not in seen else f"{tag}_{run}"
            seen.add(name)
            _copy_run(src_path, out, run)
            if name != run:
                os.rename(os.path.join(output_zarr, run),
                          os.path.join(output_zarr, name))
    return output_zarr
