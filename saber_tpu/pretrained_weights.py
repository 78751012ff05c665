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


def get_sam3_checkpoint(download: bool = True) -> Optional[str]:
    """Local path to the official SAM3 checkpoint, or None.

    The reference downloads facebook/sam3 from HuggingFace through the
    sam3 package (reference pretrained_weights.py:68-101); here the hub
    client (bundled with transformers) fetches it directly. The repo is
    gated: request access at huggingface.co/facebook/sam3 and set
    HF_TOKEN or `huggingface-cli login` first. Zero-egress environments
    fall through to None (random init) with instructions, matching the
    SAM2 path's behavior.
    """
    local = os.path.join(checkpoint_dir(), "sam3.pt")
    if os.path.exists(local):
        return local
    if not download:
        return None
    try:
        from huggingface_hub import hf_hub_download
        path = hf_hub_download(
            repo_id="facebook/sam3", filename="sam3.pt",
            token=os.environ.get("HF_TOKEN"))
        import shutil
        shutil.copy2(path, local)
        return local
    except Exception as e:
        print(f"SAM3 checkpoint unavailable ({e}).\n"
              "To use pretrained SAM3 weights:\n"
              "  1. request access at https://huggingface.co/facebook/sam3\n"
              "  2. set HF_TOKEN (or huggingface-cli login)\n"
              "  3. or place sam3.pt in " + checkpoint_dir() + "\n"
              "Continuing with random weights.")
        return None


def get_clip_bpe_path(download: bool = True) -> Optional[str]:
    """Local path to the CLIP BPE merges file the SAM3 tokenizer needs,
    or None (reference pretrained_weights.py:104-148). Resolution order:
    SABER_BPE_PATH env var → checkpoint cache → download (OpenAI CDN,
    ungated)."""
    env = os.environ.get("SABER_BPE_PATH")
    if env and os.path.exists(env):
        return env
    local = os.path.join(checkpoint_dir(), "bpe_simple_vocab_16e6.txt.gz")
    if os.path.exists(local):
        return local
    if not download:
        return None
    url = ("https://openaipublic.azureedge.net/clip/"
           "bpe_simple_vocab_16e6.txt.gz")
    try:
        urllib.request.urlretrieve(url, local + ".tmp")
        os.replace(local + ".tmp", local)
        return local
    except Exception as e:
        print(f"CLIP BPE vocabulary unavailable ({e}); the tokenizer "
              f"falls back to byte-level. Download {url} manually into "
              f"{checkpoint_dir()} or set SABER_BPE_PATH.")
        return None
