"""SAM3 (text-prompted) adapter — scheduled component.

The reference's SAM3 path (saber/adapters/sam3/predictor.py) wraps the
external ``sam3`` package for text-prompted detection + SAM2-style
tracking. The native JAX port is a later phase (SURVEY.md §7.8); the
adapter seam and config (saber_tpu.config.SAM3AdapterConfig) are already
in place so segmenters and CLIs route correctly.
"""

from saber_tpu.adapters.base import BaseAdapter
from saber_tpu.config import SAM3AdapterConfig


class SAM3Adapter(BaseAdapter):
    def __init__(self, config: SAM3AdapterConfig, device: str = "tpu"):
        raise NotImplementedError(
            "The native SAM3 (text-prompt) backend is not implemented yet; "
            "use SAM2AdapterConfig. The adapter seam (BaseAdapter) is "
            "identical, so pipelines will work unchanged once it lands.")

    segment_image_2d = None
    set_volume = None
    add_new_mask = None
    add_new_points_or_box = None
    propagate_in_video = None
    segment_volume = None
    reset_state = None
