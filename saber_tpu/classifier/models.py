"""Classifier model families (reference saber/classifier/models/*).

- ``SAM2Classifier``: frozen SAM2 image encoder → ROI/RONI-masked feature
  concat → conv projection → pooled MLP head (reference
  classifier/models/SAM2.py:21-220). The reference detours each batch
  through numpy and the torch predictor (SAM2.py:130-147 — SURVEY.md
  flags it as a known inefficiency); here crops stay on device end to end
  and the encoder runs under the same jit as the head.
- ``ConvNeXtClassifier`` / ``SwinClassifier``: standalone backbones over a
  2-channel ROI/RONI input (`input_mode='concatenate'`, reference
  ConvNeXt.py:6-57, SwinTransformer.py:6-66) — native Flax versions
  (torchvision is not a dependency here).
- ``get_classifier_model``: factory (reference common.py:5-92).
"""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from saber_tpu.models.hiera import window_partition, window_unpartition
from saber_tpu.models.memory import CXBlock
from saber_tpu.models.attention import scaled_dot_product_attention


class MLPHead(nn.Module):
    hidden: int
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
        return x.astype(jnp.float32)


class ROIFeatureHead(nn.Module):
    """ROI/RONI masked-feature head over encoder embeddings
    (reference SAM2.py:59-88, 169-197)."""
    num_classes: int
    feat_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, mask_small, train: bool = False):
        """embed: (B, H, W, C) encoder features; mask_small: (B, H, W)."""
        m = mask_small[..., None].astype(embed.dtype)
        roi = embed * m
        roni = embed * (1.0 - m)
        x = jnp.concatenate([roi, roni], axis=-1)          # (B, H, W, 2C)
        x = nn.Conv(self.feat_dim, (3, 3), dtype=self.dtype, name="proj_conv1")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="proj_ln")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.feat_dim // 2, (3, 3), dtype=self.dtype,
                    name="proj_conv2")(x)
        x = nn.gelu(x)
        x = jnp.mean(x, axis=(1, 2))                       # global avg pool
        return MLPHead(self.feat_dim, self.num_classes, dtype=self.dtype,
                       name="head")(x, train=train)


class SAM2Classifier(nn.Module):
    """Frozen-SAM2-backbone classifier. ``backbone_apply`` is supplied by
    the caller so encoder params stay frozen and shareable with the
    segmentation pipeline (no duplicate weights in HBM)."""
    num_classes: int
    input_mode: str = "separate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, mask_small, train: bool = False):
        """embed: precomputed (B, H, W, 256) SAM2 /16 features (frozen);
        mask_small: (B, H, W) mask at feature resolution."""
        return ROIFeatureHead(self.num_classes, dtype=self.dtype,
                              name="roi_head")(embed, mask_small, train=train)


class SAM3Classifier(nn.Module):
    """Frozen-SAM3-VL-backbone classifier (reference
    classifier/models/SAM3.py:12-225). Identical ROI/RONI head over the
    backbone's SAM2-compatible ``vision_features`` — [B, 63, 63, 256] at
    1008 px vs SAM2's [B, 64, 64, 256] (reference SAM3.py:23-26); the head
    global-pools, so both grids work (the reference uses adaptive pooling
    for the same reason, SAM3.py:74, 200)."""
    num_classes: int
    input_mode: str = "separate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, mask_small, train: bool = False):
        """embed: precomputed (B, H, W, 256) SAM3 /16 features (frozen);
        mask_small: (B, H, W) mask at feature resolution."""
        return ROIFeatureHead(self.num_classes, dtype=self.dtype,
                              name="roi_head")(embed, mask_small, train=train)


class ConvNeXtClassifier(nn.Module):
    """Compact ConvNeXt over 2-channel ROI/RONI input
    (reference ConvNeXt.py:6-57; input_mode='concatenate')."""
    num_classes: int
    depths: Sequence[int] = (2, 2, 6, 2)
    dims: Sequence[int] = (64, 128, 256, 512)
    input_mode: str = "concatenate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 2) = stacked (image·mask, image·(1-mask))."""
        x = x.astype(self.dtype)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="stem_ln")(x)
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                x = nn.LayerNorm(dtype=jnp.float32, name=f"down_ln_{si}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down_{si}")(x)
            for bi in range(depth):
                x = CXBlock(dim, dtype=self.dtype, name=f"block_{si}_{bi}")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(dtype=jnp.float32, name="final_ln")(x)
        return MLPHead(self.dims[-1], self.num_classes, dtype=self.dtype,
                       name="head")(x, train=train)


class _SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        win, pad_hw = window_partition(x, self.window)
        bw, ws, _, _ = win.shape
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(win)
        qkv = qkv.reshape(bw, ws * ws, 3, self.num_heads, self.dim // self.num_heads)
        out = scaled_dot_product_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        out = out.reshape(bw, ws, ws, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        x = window_unpartition(out, self.window, pad_hw, (h, w))
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(y)
        return x + y


class SwinClassifier(nn.Module):
    """Compact shifted-window transformer classifier
    (reference SwinTransformer.py:6-66)."""
    num_classes: int
    depths: Sequence[int] = (2, 2, 4)
    dims: Sequence[int] = (64, 128, 256)
    heads: Sequence[int] = (2, 4, 8)
    window: int = 8
    input_mode: str = "concatenate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        for si, (depth, dim, nh) in enumerate(zip(self.depths, self.dims, self.heads)):
            if si > 0:
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"merge_{si}")(x)
            for bi in range(depth):
                x = _SwinBlock(dim, nh, self.window,
                               shift=(self.window // 2) if bi % 2 else 0,
                               dtype=self.dtype, name=f"block_{si}_{bi}")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(dtype=jnp.float32, name="final_ln")(x)
        return MLPHead(self.dims[-1], self.num_classes, dtype=self.dtype,
                       name="head")(x, train=train)


MODEL_REGISTRY = {
    "SAM2": SAM2Classifier,
    "SAM3": SAM3Classifier,
    "ConvNeXt": ConvNeXtClassifier,
    "SwinTransformer": SwinClassifier,
}


def get_classifier_model(name: str, num_classes: int,
                         sam2_cfg: Optional[str] = None,
                         dtype=jnp.float32) -> nn.Module:
    """Factory (reference common.py:5-92). ``sam2_cfg`` only matters for
    the SAM2 family (selects the frozen backbone size in the trainer)."""
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown classifier model '{name}', "
                         f"want one of {list(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](num_classes=num_classes, dtype=dtype)
