"""Configuration models for saber-tpu.

Mirrors the machine-facing config surface of the reference:
- ``AMGConfig``   ↔ cfgAMG (reference saber/adapters/sam2/amg.py:4-37)
- ``SAM2AdapterConfig`` / ``SAM3AdapterConfig`` ↔ reference
  saber/adapters/base.py:7-45

The fields and defaults are contract-compatible with the reference so that
trained-classifier YAML artifacts (``model_config.yaml`` with ``amg_params``)
round-trip between the two frameworks.
"""

from typing import Any, Dict, Literal, Optional, Union

from pydantic import BaseModel, ConfigDict, Field, field_validator, model_validator

_VALID_SAM2_CFGS = ("tiny", "small", "base", "large")


class AMGConfig(BaseModel):
    """Automatic-mask-generator hyperparameters.

    Contract-compatible with the reference ``cfgAMG``
    (saber/adapters/sam2/amg.py:4-26): same field names, defaults, and
    validation, plus TPU-specific static-capacity knobs (``max_masks``)
    needed because the JAX AMG runs with fixed shapes under ``jit``.
    """

    npoints: int = Field(gt=0, default=32, description="Point-grid side length")
    points_per_batch: int = Field(gt=0, default=64)
    pred_iou_thresh: float = Field(gt=0, le=1.0, default=0.7)
    stability_score_thresh: float = Field(ge=0, le=1.0, default=0.92)
    stability_score_offset: float = Field(default=0.7)
    crop_n_layers: int = Field(ge=0, default=2)
    box_nms_thresh: float = Field(gt=0, le=1.0, default=0.7)
    crop_n_points_downscale_factor: int = Field(gt=0, default=2)
    use_m2m: bool = Field(default=True)
    multimask_output: bool = Field(default=True)
    sam2_cfg: str = Field(default="small")

    # TPU-specific: static output capacity for jit-compiled AMG. The device
    # pipeline produces at most this many candidate masks per image; the
    # mask-dict list returned at the API boundary is trimmed to the valid set.
    max_masks: int = Field(gt=0, default=256)
    crop_overlap_ratio: float = Field(default=512 / 1500)
    # TPU-specific: total prompts decoded per scan step across a layer's
    # batched crops (per-crop chunk = budget // n_crops, still capped by
    # points_per_batch). 1024 keeps the 16-crop layer at 64 prompts/crop;
    # lower it if decode intermediates exceed HBM on small chips.
    step_prompt_budget: int = Field(gt=0, default=1024)
    # Score stability on bilinear-upscaled full-resolution logits (torch
    # AMG semantics; two extra MXU matmuls per mask) instead of the 256²
    # decoder logits. The low-res shortcut deviates by up to ~0.2 near the
    # 0.92 gate on small masks (tests/test_amg_golden.py).
    stability_fullres: bool = Field(default=True)

    @field_validator("sam2_cfg")
    @classmethod
    def _validate_sam2_cfg(cls, v: str) -> str:
        if v not in _VALID_SAM2_CFGS:
            raise ValueError(f"sam2_cfg must be one of {list(_VALID_SAM2_CFGS)}, got {v}")
        return v

    def dict(self, *args: Any, **kwargs: Any) -> Dict[str, Any]:  # noqa: A003
        return self.model_dump(*args, **kwargs)

    def to_dict(self, *args: Any, **kwargs: Any) -> Dict[str, Any]:
        return self.dict(*args, **kwargs)


# Reference-compatible alias (reference code spells it cfgAMG).
cfgAMG = AMGConfig


class SAM2AdapterConfig(BaseModel):
    """Config for the JAX SAM2 adapter (reference saber/adapters/base.py:7-33).

    ``classifier`` may be a loaded ``Predictor``; when given and ``amg_cfg``
    is unset, the AMG parameters and model size stored at training time are
    auto-derived, closing the train→inference loop exactly like the
    reference's ``_derive_from_classifier`` validator (base.py:19-26).
    """

    model_config = ConfigDict(arbitrary_types_allowed=True)

    model_type: Literal["sam2"] = "sam2"
    cfg: str = Field("small", description="tiny / small / base / large")
    checkpoint: Optional[str] = None
    num_maskmem: int = 2
    light_modality: bool = False
    amg_cfg: Optional[AMGConfig] = None
    min_mask_area: int = 50
    classifier: Optional[Any] = None

    # TPU-specific knobs.
    dtype: str = Field("bfloat16", description="compute dtype for the encoder")
    image_size: int = 1024

    @model_validator(mode="after")
    def _derive_from_classifier(self) -> "SAM2AdapterConfig":
        if self.classifier is not None and self.amg_cfg is None:
            amg_params = dict(self.classifier.config["amg_params"])
            self.cfg = amg_params.get("sam2_cfg", self.cfg)
            known = set(AMGConfig.model_fields)
            self.amg_cfg = AMGConfig(**{k: v for k, v in amg_params.items() if k in known})
        return self

    @field_validator("cfg")
    @classmethod
    def _check_cfg(cls, v: str) -> str:
        if v not in _VALID_SAM2_CFGS:
            raise ValueError(f"cfg must be one of tiny/small/base/large, got '{v}'")
        return v


class SAM3AdapterConfig(BaseModel):
    """Config for the (text-prompted) SAM3 adapter (reference base.py:36-43).

    Reference fields plus the TPU-build knobs mirroring SAM2AdapterConfig
    (model preset, image size, compute dtype, tracker memory size).
    """

    model_type: Literal["sam3"] = "sam3"
    checkpoint_path: Optional[str] = None
    load_from_HF: bool = True
    light_modality: bool = False
    text_prompt: Optional[str] = None
    min_mask_area: int = 50

    # TPU-specific knobs.
    cfg: str = Field("large", description="large / base / test preset")
    image_size: Optional[int] = Field(
        None, description="None → preset default (1008 full / 64 test)")
    dtype: str = Field("bfloat16", description="compute dtype")
    num_maskmem: int = 7

    @field_validator("cfg")
    @classmethod
    def _check_cfg(cls, v: str) -> str:
        if v not in ("large", "base", "test"):
            raise ValueError(f"cfg must be one of large/base/test, got '{v}'")
        return v


def sam3_adapter_config(text_prompt: Optional[str] = None,
                        **kwargs: Any) -> SAM3AdapterConfig:
    """SAM3 config honoring SABER_SAM3_PRESET / SABER_SAM3_IMAGE_SIZE env
    overrides, so CLI workflows can run the CI-sized preset in tests."""
    import os
    kwargs.setdefault("cfg", os.environ.get("SABER_SAM3_PRESET", "large"))
    size = os.environ.get("SABER_SAM3_IMAGE_SIZE")
    if size and "image_size" not in kwargs:
        kwargs["image_size"] = int(size)
    return SAM3AdapterConfig(text_prompt=text_prompt, **kwargs)


AdapterConfig = Union[SAM2AdapterConfig, SAM3AdapterConfig]
