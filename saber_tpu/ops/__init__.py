"""Tensor ops: on-device preprocessing, filters, and mask algebra.

TPU-native replacements for the reference's torch/scipy compute
(saber/filters/*, saber/utils/preprocessing.py, saber/segmenters/utils.py).
Everything here is functional jnp code, jit-friendly, and static-shape.
"""

from saber_tpu.ops.preprocessing import contrast, normalize, prepare, project_tomogram  # noqa: F401
from saber_tpu.ops.downsample import fourier_rescale_2d, fourier_rescale_3d, FourierRescale2D, FourierRescale3D  # noqa: F401
from saber_tpu.ops.gaussian import gaussian_smoothing, gaussian_smoothing_3d  # noqa: F401
