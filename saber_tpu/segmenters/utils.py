"""Segmenter utilities (reference saber/segmenters/utils.py).

The heavy math lives in saber_tpu.ops (device-batched IoU dedup, CC
labeling); this module re-exports it under the reference's module path so
downstream code and user imports stay source-compatible.
"""

from saber_tpu.ops.connected import separate_masks  # noqa: F401
from saber_tpu.ops.masks import remove_duplicate_masks  # noqa: F401
