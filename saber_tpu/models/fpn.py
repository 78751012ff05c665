"""FPN neck over the Hiera trunk (SAM2 image encoder).

Native replacement for the sam2 package's FpnNeck/ImageEncoder (reference
consumes them via build_sam2, saber/adapters/sam2/automask.py:56-62).
Lateral 1×1 convs project every stage to d_model=256; the designated
top-down levels fuse an upsampled coarser map; the lowest-resolution level
is discarded ("scalp"), leaving features at strides 4/8/16 — the /16 map
is the SAM image embedding, /4 and /8 are the decoder's high-res skips.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from saber_tpu.models.position_encoding import position_embedding_sine


class FpnNeck(nn.Module):
    """NHWC FPN: inputs low→high stride, outputs same order, all d_model."""
    d_model: int = 256
    backbone_channel_list: Sequence[int] = (96, 192, 384, 768)  # low→high stride
    fpn_top_down_levels: Sequence[int] = (2, 3)
    fpn_interp_model: str = "nearest"
    # compute dtype (params stay fp32, repo convention). Without it the
    # lateral 1×1 convs silently promoted the bf16 trunk outputs to fp32:
    # a round-3 device trace showed the /4-level conv emitting an
    # f32[8,256,256,256] result plus a 537 MB layout copy (~2.9 ms of the
    # 187 ms encoder program) purely from the dtype mismatch.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        n = len(xs)
        outs = [None] * n
        poss = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1), use_bias=True,
                              dtype=self.dtype, name=f"convs_{i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                b, h, w, c = prev.shape
                top_down = jax.image.resize(
                    prev.astype(jnp.float32), (b, h * 2, w * 2, c),
                    method=self.fpn_interp_model).astype(lateral.dtype)
                prev = lateral + top_down
            else:
                prev = lateral
            outs[i] = prev
            poss[i] = position_embedding_sine(
                prev.shape[1], prev.shape[2], self.d_model).astype(prev.dtype)
        return outs, poss


class ImageEncoder(nn.Module):
    """Hiera trunk + FPN neck; drops the /32 level (scalp=1)."""
    trunk: nn.Module
    neck: nn.Module
    scalp: int = 1

    def __call__(self, x):
        feats = self.trunk(x)
        outs, poss = self.neck(feats)
        if self.scalp > 0:
            outs, poss = outs[: -self.scalp], poss[: -self.scalp]
        return {
            "vision_features": outs[-1],     # (B, 64, 64, 256) for 1024 input
            "vision_pos_enc": poss,
            "backbone_fpn": outs,            # [/4, /8, /16]
        }
