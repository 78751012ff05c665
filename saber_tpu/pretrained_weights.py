"""Checkpoint acquisition + path resolution
(reference saber/pretrained_weights.py:20-65, 174-202).

Official SAM2.1 checkpoints download from fbaipublicfiles into
``~/.cache/saber_tpu/checkpoints`` and load through the torch→JAX
converter (saber_tpu/models/weights.py). In zero-egress environments the
download is skipped with a clear message and models run with random
weights (checkpoint=None).
"""

import os
import urllib.request
from typing import Optional, Tuple

_SAM21_BASE = "https://dl.fbaipublicfiles.com/segment_anything_2/092824"
SAM2_CHECKPOINTS = {
    "tiny": f"{_SAM21_BASE}/sam2.1_hiera_tiny.pt",
    "small": f"{_SAM21_BASE}/sam2.1_hiera_small.pt",
    "base": f"{_SAM21_BASE}/sam2.1_hiera_base_plus.pt",
    "large": f"{_SAM21_BASE}/sam2.1_hiera_large.pt",
}


def checkpoint_dir() -> str:
    d = os.environ.get(
        "SABER_CHECKPOINT_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "saber_tpu",
                     "checkpoints"))
    os.makedirs(d, exist_ok=True)
    return d


def get_sam2_checkpoint(cfg: str, download: bool = True
                        ) -> Tuple[str, Optional[str]]:
    """cfg name → (cfg, local checkpoint path or None)
    (reference :174-202). Downloads on first use when the network allows."""
    if cfg not in SAM2_CHECKPOINTS:
        raise ValueError(f"unknown SAM2 config '{cfg}'")
    url = SAM2_CHECKPOINTS[cfg]
    local = os.path.join(checkpoint_dir(), os.path.basename(url))
    if os.path.exists(local):
        return cfg, local
    if not download:
        return cfg, None
    try:
        print(f"downloading {url} → {local}")
        urllib.request.urlretrieve(url, local + ".tmp")
        os.replace(local + ".tmp", local)
        return cfg, local
    except Exception as e:
        print(f"checkpoint download failed ({e}); running with random "
              f"weights — set SABER_CHECKPOINT_DIR to a pre-populated cache "
              f"for pretrained inference.")
        return cfg, None
