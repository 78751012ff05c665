"""2D/3D segmenter orchestration (reference saber/segmenters/base.py).

``saber2D`` drives one image end to end: optional sliding-window tiling,
AMG through the adapter seam, area/duplicate filtering, classifier-based
false-positive filtering, and local→global rasterization. ``saber3D`` adds
``propagate`` which hands seed masks to the adapter's volumetric
propagation. Orchestration is host-side by design — every hot path it
calls (AMG, dedup, classifier, propagation) is a jit-compiled device
pipeline.
"""

from typing import List, Optional, Tuple

import numpy as np

from saber_tpu.adapters.base import get_adapter
from saber_tpu.config import AdapterConfig, AMGConfig, SAM2AdapterConfig
from saber_tpu.ops import masks as mask_filters
from saber_tpu.segmenters import utils


class saber2D:
    """Single-image segmentation orchestrator (reference base.py:18-232)."""

    def __init__(self,
                 deviceID: int = 0,
                 cfg: Optional[AdapterConfig] = None,
                 amg_cfg: Optional[AMGConfig] = None,
                 min_mask_area: int = 50,
                 window_size: int = 256,
                 overlap_ratio: float = 0.25):
        if cfg is None and amg_cfg is None:
            raise ValueError("Either provide an AdapterConfig or AMG Config!")
        if cfg is None:
            cfg = SAM2AdapterConfig(amg_cfg=amg_cfg, min_mask_area=min_mask_area)

        self.min_mask_area = min_mask_area
        self.window_size = window_size
        self.overlap_ratio = overlap_ratio
        self.deviceID = deviceID

        classifier = getattr(cfg, "classifier", None)
        self.classifier = classifier
        self.batchsize = 32 if classifier is not None else None

        self.adapter_cfg = cfg
        self.adapter = get_adapter(cfg)

        self.image = None
        self.masks: List = []
        self.save_button = False
        self.remove_repeating_masks = True
        self.target_class: Optional[int] = None

    # ------------------------------------------------------------------

    def segment(self, image: np.ndarray, target_class: Optional[int] = None,
                text: Optional[str] = None, threshold: Optional[float] = 0.5,
                display: bool = False, use_sliding_window: bool = False) -> list:
        return self.segment_image(
            image, display=display, use_sliding_window=use_sliding_window,
            text_prompt=text, threshold=threshold, target_class=target_class)

    def segment_image(self, image: np.ndarray, display: bool = True,
                      use_sliding_window: bool = False,
                      text_prompt: Optional[str] = None,
                      threshold: Optional[float] = 0.5,
                      target_class: Optional[int] = 1):
        """Segment one image (reference base.py:84-157)."""
        self.target_class = target_class
        if use_sliding_window:
            all_masks = []
            for (y1, x1, y2, x2) in self.get_sliding_windows(image.shape):
                window_image = image[y1:y2, x1:x2]
                window_masks = self.adapter.segment_image_2d(
                    window_image, text_prompt=text_prompt)
                curr = []
                for m in window_masks:
                    if m["area"] < self.min_mask_area:
                        continue
                    m["offset"] = (y1, x1)
                    m["bbox"] = self._to_global_bbox(m["bbox"], y1, x1)
                    curr.append(m)
                all_masks.extend(self._apply_classifier(window_image, curr))
            self.masks = self.rasterize_masks(image, all_masks)
        else:
            self.masks = self.adapter.segment_image_2d(
                image, text_prompt=text_prompt)
            self.masks = self._apply_classifier(image, self.masks)

        if display:
            from saber_tpu.visualization import classifier as viz
            viz.display_mask_list(image, self.masks, self.save_button)

        self.image = image
        return self.masks

    def _apply_classifier(self, image, masks):
        """Area filter → dedup → classifier or area sort (base.py:159-176)."""
        masks = [m for m in masks if m["area"] >= self.min_mask_area]
        if self.remove_repeating_masks:
            masks = utils.remove_duplicate_masks(masks)
        if self.classifier is None:
            masks = sorted(masks, key=lambda m: m["area"], reverse=False)
        else:
            gray = image[:, :, 0] if image.ndim == 3 else image
            masks = mask_filters.apply_classifier(
                gray, masks, self.classifier, self.target_class, self.batchsize)
        return masks

    def get_sliding_windows(self, image_shape: Tuple[int, ...]
                            ) -> List[Tuple[int, int, int, int]]:
        """Tiling coordinates (base.py:178-205): stride = w·(1-overlap),
        windows smaller than w/2 in either dim are skipped."""
        h, w = image_shape[:2]
        stride = int(self.window_size * (1 - self.overlap_ratio))
        windows = []
        for y in range(0, h, stride):
            for x in range(0, w, stride):
                y2, x2 = min(y + self.window_size, h), min(x + self.window_size, w)
                if (y2 - y) < self.window_size // 2 or (x2 - x) < self.window_size // 2:
                    continue
                windows.append((y, x, y2, x2))
        return windows

    @staticmethod
    def _to_global_bbox(local_bbox, y0, x0):
        x, y, w, h = local_bbox
        return [x + x0, y + y0, w, h]

    def rasterize_masks(self, image, masks):
        """Expand window-local masks to full-image frames (base.py:212-232)."""
        H, W = image.shape[:2]
        out = []
        for m in masks:
            y0, x0 = m["offset"]
            seg = m["segmentation"]
            h, w = seg.shape
            full = np.zeros((H, W), dtype=bool)
            y1, x1 = max(0, y0), max(0, x0)
            y2, x2 = min(H, y0 + h), min(W, x0 + w)
            full[y1:y2, x1:x2] = seg[y1 - y0:y1 - y0 + (y2 - y1),
                                     x1 - x0:x1 - x0 + (x2 - x1)]
            m2 = dict(m)
            m2["segmentation"] = full
            out.append(m2)
        return out


class saber3D(saber2D):
    """Adds volumetric propagation (reference base.py:234-280)."""

    def __init__(self, deviceID: int = 0, cfg: Optional[AdapterConfig] = None,
                 amg_cfg: Optional[AMGConfig] = None, min_mask_area: int = 50):
        super().__init__(deviceID=deviceID, cfg=cfg, amg_cfg=amg_cfg,
                         min_mask_area=min_mask_area)
        self.video_predictor = self.adapter
        self._vol_loaded = False
        self.min_logits = 0.5
        self.confidence_debug = False
        self.nframes = None            # None → full-volume propagation
        self.filter_threshold = 0.5
        self.ann_frame_idx: Optional[int] = None

    def propagate(self, mask_shape, target_class: Optional[int] = 1):
        """Seed ``self.masks`` and propagate bidirectionally (base.py:265-280)."""
        if isinstance(self.masks[0], dict):
            mask_arrays = [m["segmentation"] for m in self.masks]
        else:
            mask_arrays = self.masks
        vol_masks = self.video_predictor.segment_volume(
            start_frame_idx=self.ann_frame_idx,
            masks=mask_arrays,
            vol_shape=mask_shape,
            max_frame_num_to_track=self.nframes,
            min_presence_score=self.filter_threshold)
        self.video_predictor.reset_state()
        return vol_masks
