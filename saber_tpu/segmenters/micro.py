"""Micrograph (2D-only) segmenter (reference saber/segmenters/micro.py)."""

from typing import Optional

from saber_tpu.config import AdapterConfig, AMGConfig
from saber_tpu.segmenters.base import saber2D


class cryoMicroSegmenter(saber2D):
    def __init__(self, deviceID: int = 0, cfg: Optional[AdapterConfig] = None,
                 amg_cfg: Optional[AMGConfig] = None, min_mask_area: int = 50,
                 window_size: int = 256, overlap_ratio: float = 0.25):
        super().__init__(cfg=cfg, amg_cfg=amg_cfg, deviceID=deviceID,
                         min_mask_area=min_mask_area, window_size=window_size,
                         overlap_ratio=overlap_ratio)
        self.max_pixels = 1280  # single-inference guardrail (micro.py:25)

    def segment(self, image0, target_class: Optional[int] = None,
                text: Optional[str] = None, display: bool = True,
                threshold: Optional[float] = 0.5,
                use_sliding_window: bool = False):
        self.image0 = image0
        nx, ny = image0.shape[:2]
        if (nx > self.max_pixels or ny > self.max_pixels) and not use_sliding_window:
            print(f"Image is larger than {self.max_pixels} pixels in at least "
                  f"one dimension.\nCurrent size: ({nx}, {ny})")
            print("Consider downsampling or using sliding-window inference.")
        return super().segment(
            image0, target_class=target_class, text=text, threshold=threshold,
            display=display, use_sliding_window=use_sliding_window)
