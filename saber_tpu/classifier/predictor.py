"""Classifier inference (reference saber/classifier/models/predictor.py).

Loads ``model_config.yaml`` + best-model weights, exposes
``batch_predict(image, masks, batchsize) -> (N, num_classes)`` softmax
probabilities. Per-mask adaptive crops (320², reference :208-234) batch
through one jit forward; masks below the 250-px area floor are assigned
to background directly (reference :88-95).
"""

import os
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import serialization

from saber_tpu.classifier.crop import crop_and_resize_adaptive
from saber_tpu.classifier.models import (SAM2Classifier, SAM3Classifier,
                                         get_classifier_model)

MIN_AREA = 250


class Predictor:
    def __init__(self, model_config: str, model_weights: Optional[str] = None):
        """model_config: path to model_config.yaml (or its directory)."""
        if os.path.isdir(model_config):
            model_config = os.path.join(model_config, "model_config.yaml")
        with open(model_config) as f:
            self.config: Dict[str, Any] = yaml.safe_load(f)
        if model_weights is None:
            model_weights = os.path.join(os.path.dirname(model_config),
                                         "best_model.msgpack")

        self.num_classes = int(self.config["num_classes"])
        self.model = get_classifier_model(self.config["model_type"],
                                          self.num_classes)
        self.is_sam2 = isinstance(self.model, SAM2Classifier)
        self.is_sam3 = isinstance(self.model, SAM3Classifier)
        self.uses_backbone = self.is_sam2 or self.is_sam3
        size = int(self.config.get("backbone_image_size", 320))
        self.crop_size = 320
        if self.is_sam2:
            from saber_tpu.models.sam2 import build_sam2
            self.backbone, self.backbone_params = build_sam2(
                self.config.get("sam2_cfg", "tiny"), image_size=size)
        elif self.is_sam3:
            from saber_tpu.models.sam3 import build_sam3
            self.backbone, self.backbone_params = build_sam3(
                self.config.get("sam3_cfg", "base"), image_size=size)
        else:
            self.backbone = self.backbone_params = None

        # template init then load bytes
        rng = jax.random.PRNGKey(0)
        if self.uses_backbone:
            fs = self.backbone.config.feat_size
            template = self.model.init(rng, jnp.zeros((1, fs, fs, 256)),
                                       jnp.zeros((1, fs, fs)))["params"]
        else:
            template = self.model.init(rng, jnp.zeros((1, 320, 320, 2)))["params"]
        with open(model_weights, "rb") as f:
            self.params = serialization.from_bytes(template, f.read())
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, params, images, masks):
        """images/masks: (B, 320, 320) → (B, num_classes) probabilities.

        Accepts narrow wire dtypes (fp16 images, uint8 masks) and widens
        here — the caller keeps the wire small on remote-TPU relays."""
        images = images.astype(jnp.float32)
        masks = masks.astype(jnp.float32)
        if self.uses_backbone:
            size = self.backbone.config.image_size
            if images.shape[1] != size or images.shape[2] != size:
                images = jax.image.resize(
                    images, (images.shape[0], size, size), "bilinear")
            rgb = jnp.repeat(images[..., None], 3, axis=-1)
            bb = self.backbone.apply({"params": self.backbone_params}, rgb,
                                     method=type(self.backbone).encode_image)
            embed = bb["vision_features"]
            fs = embed.shape[1]
            ms = jax.image.resize(masks, (masks.shape[0], fs, fs), "nearest")
            logits = self.model.apply({"params": params}, embed, ms)
        else:
            x = jnp.stack([images * masks, images * (1 - masks)], axis=-1)
            logits = self.model.apply({"params": params}, x)
        return jax.nn.softmax(logits, axis=-1)

    def batch_predict(self, image: np.ndarray, masks: np.ndarray,
                      batchsize: int = 32) -> np.ndarray:
        """Score each mask (reference predictor.py:168-206)."""
        image = np.asarray(image)
        masks = np.asarray(masks)
        n = masks.shape[0]
        probs = np.zeros((n, self.num_classes), np.float32)
        probs[:, 0] = 1.0  # default: background

        valid = [i for i in range(n) if masks[i].sum() >= MIN_AREA]
        if not valid:
            return probs

        crops_i, crops_m = [], []
        for i in valid:
            ci, cm = crop_and_resize_adaptive(image, masks[i], self.crop_size)
            ci = (ci - ci.mean()) / (ci.std() + 1e-6)
            crops_i.append(ci)
            crops_m.append(cm)
        crops_i = np.stack(crops_i)
        crops_m = np.stack(crops_m)

        outs = []
        for b0 in range(0, len(valid), batchsize):
            bi = crops_i[b0:b0 + batchsize]
            bm = crops_m[b0:b0 + batchsize]
            pad = batchsize - len(bi)
            if pad > 0:  # keep one static jit shape
                bi = np.concatenate([bi, np.zeros((pad, *bi.shape[1:]), bi.dtype)])
                bm = np.concatenate([bm, np.zeros((pad, *bm.shape[1:]), bm.dtype)])
            # narrow wire dtypes (the relay host link is ~15-30 MB/s):
            # images ship fp16 (already N(0,1)-normalized — fp16 noise is
            # ~1e-3 of std), masks ship uint8 (binary, exact); _forward
            # widens on device
            out = np.asarray(self._forward(
                self.params, jnp.asarray(bi.astype(np.float16)),
                # explicit threshold: a plain astype would truncate soft
                # masks in (0, 1) to all-zeros; callers pass binary masks
                # today but the uint8 wire narrowing must not rely on it
                jnp.asarray((bm > 0.5).astype(np.uint8))))
            outs.append(out[:batchsize - pad if pad > 0 else batchsize])
        probs[valid] = np.concatenate(outs)
        return probs


def get_predictor(model_config: str, model_weights: Optional[str] = None
                  ) -> Predictor:
    """Factory matching reference common.py get_predictor."""
    return Predictor(model_config, model_weights)
