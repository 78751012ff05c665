from saber_tpu.segmenters.base import saber2D, saber3D  # noqa: F401
from saber_tpu.segmenters.micro import cryoMicroSegmenter  # noqa: F401
from saber_tpu.segmenters.propagation import propagationSegmenter  # noqa: F401
from saber_tpu.segmenters.tomo import multiDepthTomoSegmenter, tomoSegmenter  # noqa: F401
