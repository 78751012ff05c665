"""Per-device segmenter factories — DevicePool init_fns
(reference saber/segmenters/loaders.py:9-65).

Each builds the model(s) once per device; the pool hands the returned
``models`` dict to every task on that device.
"""

from typing import Any, Dict, Optional

from saber_tpu.config import AMGConfig, SAM2AdapterConfig
from saber_tpu.segmenters.micro import cryoMicroSegmenter
from saber_tpu.segmenters.tomo import multiDepthTomoSegmenter, tomoSegmenter


def _load_classifier(model_config: Optional[str], model_weights: Optional[str]):
    if model_config is None:
        return None
    from saber_tpu.classifier.predictor import Predictor
    return Predictor(model_config, model_weights)


def _adapter_cfg(sam2_cfg: str, classifier, min_mask_area: int,
                 image_size: int = 1024, text_prompt=None):
    if text_prompt:
        # SAM3 iff a text prompt is given (reference
        # run_tomogram_segment.py:36-41, run_micrograph_segment.py)
        from saber_tpu.config import sam3_adapter_config
        return sam3_adapter_config(text_prompt, min_mask_area=min_mask_area)
    if classifier is not None:
        return SAM2AdapterConfig(classifier=classifier,
                                 min_mask_area=min_mask_area,
                                 image_size=image_size)
    return SAM2AdapterConfig(cfg=sam2_cfg,
                             amg_cfg=AMGConfig(sam2_cfg=sam2_cfg),
                             min_mask_area=min_mask_area,
                             image_size=image_size)


def micrograph_workflow(device_id: int, sam2_cfg: str = "small",
                        model_config: Optional[str] = None,
                        model_weights: Optional[str] = None,
                        min_mask_area: int = 50,
                        image_size: int = 1024,
                        text_prompt: Optional[str] = None) -> Dict[str, Any]:
    classifier = _load_classifier(model_config, model_weights)
    cfg = _adapter_cfg(sam2_cfg, classifier, min_mask_area, image_size,
                       text_prompt)
    seg = cryoMicroSegmenter(deviceID=device_id, cfg=cfg,
                             min_mask_area=min_mask_area)
    return {"segmenter": seg, "classifier": classifier}


def tomogram_workflow(device_id: int, sam2_cfg: str = "small",
                      model_config: Optional[str] = None,
                      model_weights: Optional[str] = None,
                      min_mask_area: int = 50, num_slabs: int = 1,
                      target_class: int = 1,
                      image_size: int = 1024,
                      text_prompt: Optional[str] = None) -> Dict[str, Any]:
    classifier = _load_classifier(model_config, model_weights)
    cfg = _adapter_cfg(sam2_cfg, classifier, min_mask_area, image_size,
                       text_prompt)
    if num_slabs > 1:
        seg = multiDepthTomoSegmenter(deviceID=device_id, cfg=cfg,
                                      target_class=target_class,
                                      min_mask_area=min_mask_area)
    else:
        seg = tomoSegmenter(deviceID=device_id, cfg=cfg,
                            min_mask_area=min_mask_area)
    return {"segmenter": seg, "classifier": classifier}


def base_microsegmenter(device_id: int, sam2_cfg: str = "small",
                        min_mask_area: int = 50,
                        image_size: int = 1024) -> Dict[str, Any]:
    return micrograph_workflow(device_id, sam2_cfg,
                               min_mask_area=min_mask_area,
                               image_size=image_size)


def base_tomosegmenter(device_id: int, sam2_cfg: str = "small",
                       min_mask_area: int = 50,
                       image_size: int = 1024) -> Dict[str, Any]:
    return tomogram_workflow(device_id, sam2_cfg,
                             min_mask_area=min_mask_area,
                             image_size=image_size)
