"""JAX SAM3 adapter: text-prompted 2D detection + tracker-grafted 3D.

API-compatible with the reference SAM3Adapter
(saber/adapters/sam3/predictor.py:42-484). Internals are native:

- ``segment_image_2d`` → SAM3Processor text-prompted detection with
  score thresholding + min-area filtering (reference :92-126, :17-39)
- volume propagation inherits SAM2Adapter's slab-scan machinery, which is
  exactly the reference's design — SAM3's tracker *is* the SAM2 video
  predictor with the detector backbone grafted on (reference :162-164);
  here models/sam3.SAM3 subclasses models/sam2.SAM2 so VideoCore drives
  it unchanged
- presence gating = per-frame ``sigmoid(obj_scores)`` (reference
  :408-438), not SAM2's fitted presence curve
"""

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from saber_tpu.adapters.preprocessing import TomogramPreprocessor
from saber_tpu.adapters.sam2_adapter import SAM2Adapter
from saber_tpu.config import SAM3AdapterConfig
from saber_tpu.models.sam3 import SAM3Processor, build_sam3
from saber_tpu.models.video import VideoCore
from saber_tpu.ops import preprocessing as prep

_SAM3_WEIGHTS_MISSING_MSG = (
    "SAM3 weights not found; running with random initialization. To use "
    "pretrained weights, place a converted checkpoint in the checkpoint "
    "cache and pass checkpoint_path (the official weights are gated on "
    "HuggingFace)."
)


def _sam3_output_to_mask_list(output: Dict[str, Any], min_mask_area: int
                              ) -> List[Dict[str, Any]]:
    """Processor output dict → AMG-compatible list of mask dicts
    (reference adapters/sam3/predictor.py:17-39)."""
    masks = output.get("masks")
    scores = output.get("scores")
    if masks is None:
        return []
    masks = np.asarray(masks)
    result: List[Dict[str, Any]] = []
    for i in range(masks.shape[0]):
        mask = np.squeeze(masks[i]) > 0.5
        area = int(mask.sum())
        if area < min_mask_area:
            continue
        entry: Dict[str, Any] = {"segmentation": mask, "area": area}
        if scores is not None:
            entry["predicted_iou"] = float(scores[i])
        result.append(entry)
    return result


class SAM3Adapter(SAM2Adapter):
    """Native SAM3 adapter (reference adapters/sam3/predictor.py:42-484)."""

    def __init__(self, config: SAM3AdapterConfig, device: str = "tpu",
                 encode_chunk: int = 8):
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        checkpoint = config.checkpoint_path
        if checkpoint is None and config.load_from_HF:
            # the reference's HF download path (predictor.py:101-113);
            # zero-egress environments fall through to random init loudly
            from saber_tpu.pretrained_weights import get_sam3_checkpoint
            checkpoint = get_sam3_checkpoint()
        self.model, self.params = build_sam3(
            config.cfg, image_size=config.image_size, dtype=dtype,
            num_maskmem=config.num_maskmem, checkpoint=checkpoint)
        self.core = VideoCore(self.model)
        self.preprocessor = TomogramPreprocessor(config.light_modality)
        self.encode_chunk = encode_chunk

        self.frame_metrics: Dict[int, Dict[int, Dict[str, Any]]] = {}
        self._vol_shape: Optional[Tuple[int, int, int]] = None
        self.inference_state: Optional[Dict[str, Any]] = None
        self._config = config
        self._processor: Optional[SAM3Processor] = None

    # ------------------------------------------------------------------
    # 2D segmentation (text-prompted)
    # ------------------------------------------------------------------

    def segment_image_2d(self, image: np.ndarray,
                         text_prompt: Optional[str] = None,
                         threshold: float = 0.5) -> List[Dict[str, Any]]:
        """Text-prompted 2D detection (reference predictor.py:85-126)."""
        prompt = text_prompt or self._config.text_prompt
        if not prompt:
            raise ValueError("text_prompt required for SAM3 2D segmentation")
        if self._processor is None:
            self._processor = SAM3Processor(self.model, self.params)

        import jax.numpy as jnp
        image = np.asarray(prep.prepare(jnp.asarray(image),
                                        to_rgb=image.ndim == 2))
        state = self._processor.set_image(image)
        output = self._processor.set_text_prompt(state, prompt)

        keep = output["scores"] >= threshold
        output = {
            "masks": output["masks"][keep],
            "masks_logits": output["masks_logits"][keep],
            "scores": output["scores"][keep],
        }
        return _sam3_output_to_mask_list(output, self._config.min_mask_area)

    # ------------------------------------------------------------------
    # Prompting extras (reference predictor.py:267-308)
    # ------------------------------------------------------------------

    def add_box_prompt(self, frame_idx: int, obj_id: int,
                       box_xyxy_norm: List[float],
                       inference_state=None) -> Tuple:
        """Seed with a normalized-coordinate bounding box."""
        state = inference_state or self.inference_state
        if state is None:
            raise RuntimeError("Call set_volume() before add_box_prompt().")
        h, w = state["video_height"], state["video_width"]
        x0, y0, x1, y1 = np.asarray(box_xyxy_norm, np.float32).reshape(4)
        return self.add_new_points_or_box(
            frame_idx, obj_id, inference_state=state,
            box=[x0 * w, y0 * h, x1 * w, y1 * h])

    def add_point_prompt(self, frame_idx: int, obj_id: int,
                         points_norm: np.ndarray, labels: np.ndarray,
                         inference_state=None) -> Tuple:
        """Seed with normalized-coordinate point clicks."""
        state = inference_state or self.inference_state
        if state is None:
            raise RuntimeError("Call set_volume() before add_point_prompt().")
        h, w = state["video_height"], state["video_width"]
        pts = np.asarray(points_norm, np.float32).reshape(-1, 2) * [w, h]
        return self.add_new_points_or_box(
            frame_idx, obj_id, inference_state=state,
            points=pts, labels=np.asarray(labels, np.int32))

    # ------------------------------------------------------------------
    # Presence semantics
    # ------------------------------------------------------------------

    def _presence_scores(self, frame_scores: np.ndarray) -> np.ndarray:
        """SAM3 semantics: presence = sigmoid of the per-frame object-score
        logit, no curve fitting (reference predictor.py:413-418)."""
        return 1.0 / (1.0 + np.exp(-np.asarray(frame_scores, np.float64)))
