"""Native JAX/Flax SAM2 model stack.

Replaces the external PyTorch ``sam2`` package the reference wraps
(SURVEY.md §2b): Hiera image encoder, FPN neck, prompt encoder,
two-way-attention mask decoder, memory encoder + memory attention for
video/volume propagation. All modules are NHWC, bf16-friendly, and
jit/vmap/scan-compatible (no hooks, no mutable inference state).
"""

from saber_tpu.models.sam2 import SAM2, SAM2Config, build_sam2  # noqa: F401
