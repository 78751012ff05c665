"""SAM prompt encoder: points / boxes / masks → sparse & dense embeddings.

Native replacement for the sam2 package's PromptEncoder (reference feeds
prompts through adapters/sam2/predictor.py add_new_points_or_box /
add_new_mask, base.py:71-76). Static-shape and vmap-friendly: point
batches are fixed-width with label -1 marking padded slots, so the AMG's
thousands of single-point prompts batch into one decoder call.

Label convention (SAM): -1 pad, 0 negative, 1 positive, 2 box top-left,
3 box bottom-right.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from saber_tpu.models.position_encoding import random_pe_encode, random_pe_grid


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        pe_scale = 1.0
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(stddev=pe_scale),
            (2, self.embed_dim // 2))
        # 4 point-type embeddings + not-a-point
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(stddev=1.0),
            (4, self.embed_dim))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(stddev=1.0),
            (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(stddev=1.0),
            (1, self.embed_dim))
        c = self.mask_in_chans
        self.mask_down = [
            nn.Conv(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="mask_conv1"),
            nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="mask_ln1"),
            nn.Conv(c, (2, 2), strides=(2, 2), dtype=self.dtype, name="mask_conv2"),
            nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="mask_ln2"),
            nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="mask_conv3"),
        ]

    def get_dense_pe(self) -> jnp.ndarray:
        """(H, W, C) positional encoding of the image-embedding grid."""
        h, w = self.image_embedding_size
        return random_pe_grid(h, w, self.pe_gaussian)

    def _embed_points(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points: (B, N, 2) xy pixels; labels: (B, N) int → (B, N, C)."""
        coords = (points + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32)
        pe = random_pe_encode(coords, self.pe_gaussian)
        lab = labels[..., None]
        # padded slots (-1): positional term dropped, not_a_point embedding only
        out = jnp.where(lab == -1, self.not_a_point_embed[0], pe)
        for i in range(4):
            out = out + jnp.where(lab == i, self.point_embeddings[i], 0.0)
        return out.astype(self.dtype)

    def _embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """(B, 4H, 4W, 1) low-res mask → (B, H, W, C) dense embedding."""
        x = masks.astype(self.dtype)
        x = self.mask_down[0](x)
        x = self.mask_down[1](x)
        x = nn.gelu(x, approximate=False)
        x = self.mask_down[2](x)
        x = self.mask_down[3](x)
        x = nn.gelu(x, approximate=False)
        return self.mask_down[4](x)

    def __call__(self, points: Optional[jnp.ndarray] = None,
                 labels: Optional[jnp.ndarray] = None,
                 masks: Optional[jnp.ndarray] = None,
                 batch: int = 1):
        """Returns (sparse (B,N,C), dense (B,H,W,C))."""
        h, w = self.image_embedding_size
        if points is not None:
            sparse = self._embed_points(points, labels)
            batch = points.shape[0]
        else:
            sparse = jnp.zeros((batch, 0, self.embed_dim), self.dtype)
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed[0].astype(self.dtype), (batch, h, w, self.embed_dim))
        return sparse, dense
