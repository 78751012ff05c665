"""Model-agnostic adapter contract.

The single seam between segmenters and the model backend (reference
saber/adapters/base.py:48-97; SURVEY.md L4→L3 interface). Configs live in
saber_tpu.config; this module holds the ABC and the factory.
"""

from abc import ABC, abstractmethod
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from saber_tpu.config import AdapterConfig


class BaseAdapter(ABC):
    """Common interface every tomogram adapter must implement
    (mirrors reference adapters/base.py:48-89)."""

    # Populated by segment_volume():
    # {frame_idx: {obj_id: {"presence_score": float, ...}}}
    frame_metrics: Dict[int, Dict[int, Dict[str, Any]]]

    @abstractmethod
    def segment_image_2d(self, image: np.ndarray,
                         text_prompt: Optional[str] = None
                         ) -> List[Dict[str, Any]]:
        """2D detection/segmentation → list of AMG-format mask dicts."""
        ...

    @abstractmethod
    def set_volume(self, tomogram: np.ndarray,
                   offload_video_to_cpu: bool = False) -> None: ...

    @abstractmethod
    def add_new_mask(self, frame_idx: int, obj_id: int, mask: np.ndarray,
                     inference_state=None) -> Tuple: ...

    @abstractmethod
    def add_new_points_or_box(self, frame_idx: int, obj_id: int,
                              inference_state=None, **kwargs) -> Tuple: ...

    @abstractmethod
    def propagate_in_video(self, start_frame_idx, max_frame_num_to_track=None,
                           reverse=False, inference_state=None) -> Iterator: ...

    @abstractmethod
    def segment_volume(self, start_frame_idx: int, masks=None, vol_shape=None,
                       max_frame_num_to_track=None,
                       min_presence_score: float = 0.5,
                       inference_state=None) -> np.ndarray: ...

    @abstractmethod
    def reset_state(self, inference_state=None) -> None: ...


def get_adapter(config: AdapterConfig, device: str = "tpu") -> BaseAdapter:
    """Factory (reference base.py:92-97). ``device`` kept for API parity;
    placement is governed by JAX."""
    if config.model_type == "sam2":
        from saber_tpu.adapters.sam2_adapter import SAM2Adapter
        return SAM2Adapter(config)
    from saber_tpu.adapters.sam3_adapter import SAM3Adapter
    return SAM3Adapter(config)
