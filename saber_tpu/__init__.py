"""saber-tpu: TPU-native rebuild of chanzuckerberg/saber.

A JAX/XLA/Pallas framework for zero-shot and classifier-filtered
segmentation of electron-microscopy data (2D cryo-EM micrographs, 3D
cryo-ET tomograms, FIB-SEM stacks, light-microscopy movies).

Mirrors the public surface of the reference (saber/__init__.py:1-7) while
replacing the external PyTorch SAM2/SAM3 stacks with a native JAX
implementation (see saber_tpu.models) and the CUDA task runtime with a
device-mesh runner (see saber_tpu.parallel).
"""

__version__ = "0.1.0"

from saber_tpu.config import (  # noqa: F401
    AMGConfig,
    SAM2AdapterConfig,
    SAM3AdapterConfig,
)
