"""Hiera hierarchical vision encoder (SAM2 trunk), Flax/NHWC.

Native reimplementation of the Hiera backbone consumed by the reference
through the external ``sam2`` package (reference call sites:
saber/adapters/sam2/automask.py:56-62, adapters/sam2/predictor.py:24-26).
Architecture follows "Hiera: A Hierarchical Vision Transformer without the
Bells-and-Whistles" as configured in SAM2.1:

- patch embed: 7×7 stride-4 conv → (H/4, W/4, C)
- 4 stages; channel dim and head count double at each transition;
  q-pooling (2×2 maxpool on queries) at the first block of stages 2-4
- window attention with per-stage window sizes; a few designated blocks
  use global attention
- absolute position embedding = interpolated background embedding +
  tiled window embedding

TPU-first choices: NHWC layout throughout, window partitioning by
reshape/transpose (no gather), bf16 matmuls with fp32 layer norms, and a
batched attention layout (windows fold into the batch axis so the MXU sees
large GEMMs). Multi-scale stage outputs feed the FPN neck (fpn.py).
"""

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# space-to-depth patch embed (see PatchEmbed): default on — on-chip A/B
# measured 190.1 → 188.3 ms on the hiera-L/1024/b8 encoder; exact math
# (CPU check 1.2e-6). SABER_S2D_PATCH=0 reverts to the direct conv.
_S2D_PATCH = os.environ.get("SABER_S2D_PATCH", "1") == "1"

from saber_tpu.models.attention import scaled_dot_product_attention
from saber_tpu.models.norms import LayerNormFast


def window_partition(x: jnp.ndarray, window: int):
    """(B, H, W, C) → (B·nW, window, window, C) with zero padding."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: jnp.ndarray, window: int, pad_hw, hw):
    """Inverse of window_partition, cropping padding."""
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class PatchEmbed(nn.Module):
    """7×7 stride-4 overlapping patch embedding.

    With ``space_to_depth=True`` the same convolution runs as a 2×2
    stride-1 conv over a 4×4-blocked 48-channel input — exact math, just
    a summation reorder: output row 4p+i-3 lands in block u = p-1+du with
    i = 4·du + a - 1 (du ∈ {0,1}, a ∈ [0,4)), so the canonical (7,7,3,C)
    kernel scatters into (2,2,48,C) with 49/64 taps non-zero. XLA's
    direct lowering of the low-channel 7×7 stride-4 conv ran at ~3% MXU
    (3.6 ms of the 187 ms hiera-L encoder trace); the blocked form is a
    dense K=192 contraction. The param tree keeps the canonical (7,7,3,C)
    kernel either way (checkpoint layout unchanged).
    """
    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        if not self.space_to_depth or x.shape[1] % 4 or x.shape[2] % 4:
            return nn.Conv(self.embed_dim, (7, 7), strides=(4, 4),
                           padding=(3, 3), dtype=self.dtype, name="proj")(x)
        b, h, w, cin = x.shape
        kern, bias = _ConvParams((7, 7, cin, self.embed_dim), name="proj")()
        # scatter the (7,7,cin,C) kernel into blocked (2,2,4,4,cin,C):
        # tap (i,j) → (du,a) with i = 4·du + a - 1; i = -1 stays zero
        k2 = jnp.zeros((2, 2, 4, 4, cin, self.embed_dim), kern.dtype)
        for du in range(2):
            for dv in range(2):
                a_lo = 1 if du == 0 else 0
                b_lo = 1 if dv == 0 else 0
                i_lo, j_lo = 4 * du + a_lo - 1, 4 * dv + b_lo - 1
                k2 = k2.at[du, dv, a_lo:, b_lo:].set(
                    kern[i_lo:4 * du + 3, j_lo:4 * dv + 3])
        k2 = k2.reshape(2, 2, 16 * cin, self.embed_dim).astype(self.dtype)
        xb = x.reshape(b, h // 4, 4, w // 4, 4, cin)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4,
                                                    16 * cin)
        out = jax.lax.conv_general_dilated(
            xb.astype(self.dtype), k2, window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        return out + bias.astype(self.dtype)


class MultiScaleAttention(nn.Module):
    """Windowed/global attention with optional 2×2 query pooling."""
    dim_out: int
    num_heads: int
    q_stride: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, _ = x.shape
        d = self.dim_out
        head_dim = d // self.num_heads
        # flatten spatial dims first: Dense on 4-D NHWC tensors can lower
        # to 1×1 convolutions with layout-transition copies; on (N, C) it
        # is a plain GEMM
        xt = x.reshape(b, h * w, x.shape[-1])
        # q/k/v as three GEMMs over STATIC weight slices of the packed
        # "qkv" kernel: slicing the (B, T, 3C) activation instead put the
        # k/v splits at lane offsets C, 2C (576, 1152 — not 128-aligned
        # for hiera-L stage 3), which lowered to strided relayout copies
        # worth ~1.4 ms/slice in the round-3 device trace. Same param
        # tree as nn.Dense(3C, name="qkv") (torch packs rows q,k,v too —
        # the converter's layout rule is unchanged).
        kern, bias = _DenseParams(xt.shape[-1], 3 * d, name="qkv")()
        dt = self.dtype
        xt_ = xt.astype(dt)
        q, k, v = (
            (xt_ @ kern[:, i * d:(i + 1) * d].astype(dt)
             + bias[i * d:(i + 1) * d].astype(dt))
            .reshape(b, h * w, self.num_heads, head_dim)
            for i in range(3))

        if self.q_stride is not None:
            sh, sw = self.q_stride
            q = q.reshape(b, h, w, d)
            q = nn.max_pool(q, window_shape=(sh, sw), strides=(sh, sw))
            hq, wq = q.shape[1], q.shape[2]
            q = q.reshape(b, hq * wq, self.num_heads, head_dim)
        out = scaled_dot_product_attention(q, k, v)
        out = out.reshape(b, -1, self.dim_out)
        if self.q_stride is not None:
            out = out.reshape(b, hq, wq, self.dim_out)
        else:
            out = out.reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class _ConvParams(nn.Module):
    """Declares nn.Conv-shaped params (kernel/bias) without applying them —
    the space-to-depth patch embed reads the same checkpoint tree nn.Conv
    owns."""
    kshape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.linear.default_kernel_init, self.kshape)
        b = self.param("bias", nn.initializers.zeros, (self.kshape[-1],))
        return k, b


class _DenseParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel/bias) without applying them —
    the fused-kernel path reads the same checkpoint tree the flax path owns."""
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.linear.default_kernel_init,
                       (self.in_dim, self.out_dim))
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return k, b


class _LNParams(nn.Module):
    """LayerNormFast-shaped params (scale/bias), value-only."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _AttnParams(nn.Module):
    """MultiScaleAttention-shaped params (qkv/proj), value-only."""
    dim: int
    dim_out: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.dim, 3 * self.dim_out, name="qkv")(),
                _DenseParams(self.dim_out, self.dim_out, name="proj")())


class MultiScaleBlock(nn.Module):
    """Hiera block: (windowed) attention + MLP with stage-transition pooling.

    With ``fused=True`` the same-dim windowed blocks run the fused Pallas
    kernels (ops/fused_block.py): LN + window attention + proj + residual
    and LN + MLP + residual each stay in VMEM instead of round-tripping
    every stage through HBM. Parameter tree is identical either way.
    """
    dim: int
    dim_out: int
    num_heads: int
    window_size: int
    q_stride: Optional[Tuple[int, int]] = None
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        # non-window-multiple H/W run in-kernel on a padded canvas with
        # exact pad-after-LN masking (ops/fused_block), so divisibility
        # alone no longer forces the flax fallback — the remaining gate is
        # Mosaic block legality (blk_w % 8), which the window-14 stage of
        # base/small/tiny cannot satisfy in budget
        if self.fused:
            from saber_tpu.ops.fused_block import (
                fused_attention_applicable, fused_mlp,
                fused_pool_applicable, fused_pool_attention,
                fused_window_attention)
        fused_attn = (
            self.fused and self.window_size > 0 and self.q_stride is None
            and self.dim == self.dim_out
            and fused_attention_applicable(
                x.shape[1], x.shape[2], self.window_size, self.dim,
                self.num_heads, self.dtype))
        fused_pool = (
            self.fused and self.window_size > 0
            and self.q_stride == (2, 2) and self.window_size % 2 == 0
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and fused_pool_applicable(
                x.shape[1], x.shape[2], self.window_size, self.dim,
                self.dim_out, self.num_heads, self.dtype))
        if fused_attn:
            ln_s, ln_b = _LNParams(self.dim, name="norm1")()
            (qkv_k, qkv_b), (proj_k, proj_b) = _AttnParams(
                self.dim, self.dim_out, name="attn")()
            x = fused_window_attention(
                x, ln_s, ln_b, qkv_k.astype(self.dtype), qkv_b,
                proj_k.astype(self.dtype), proj_b,
                window=self.window_size, num_heads=self.num_heads)
        elif fused_pool:
            ln_s, ln_b = _LNParams(self.dim, name="norm1")()
            short_k, short_b = _DenseParams(self.dim, self.dim_out,
                                            name="proj")()
            (qkv_k, qkv_b), (proj_k, proj_b) = _AttnParams(
                self.dim, self.dim_out, name="attn")()
            x = fused_pool_attention(
                x, ln_s, ln_b, short_k.astype(self.dtype), short_b,
                qkv_k.astype(self.dtype), qkv_b,
                proj_k.astype(self.dtype), proj_b,
                window=self.window_size, num_heads=self.num_heads)
        else:
            x = self._attention_path(x)

        if self.fused:
            hidden = int(self.dim_out * self.mlp_ratio)
            ln2_s, ln2_b = _LNParams(self.dim_out, name="norm2")()
            k1, b1 = _DenseParams(self.dim_out, hidden, name="mlp_fc1")()
            k2, b2 = _DenseParams(hidden, self.dim_out, name="mlp_fc2")()
            return fused_mlp(x, ln2_s, ln2_b, k1.astype(self.dtype), b1,
                             k2.astype(self.dtype), b2)
        return self._mlp_path(x)

    # helpers run inside __call__'s compact context (single-compact rule)
    def _attention_path(self, x):
        shortcut = x
        x = LayerNormFast(name="norm1")(x)

        if self.dim != self.dim_out:
            # project + pool the shortcut at stage transitions
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
            if self.q_stride is not None:
                shortcut = nn.max_pool(shortcut, self.q_stride, strides=self.q_stride)

        window = self.window_size
        hw = (x.shape[1], x.shape[2])
        pad_hw = hw
        if window > 0:
            x, pad_hw = window_partition(x, window)

        x = MultiScaleAttention(
            dim_out=self.dim_out, num_heads=self.num_heads,
            q_stride=self.q_stride, dtype=self.dtype, name="attn")(x)

        if self.q_stride is not None:
            # query pooling shrank each window; unpartition at pooled geometry
            window = window // self.q_stride[0]
            hw = (shortcut.shape[1], shortcut.shape[2])
            pad_hw = (pad_hw[0] // self.q_stride[0], pad_hw[1] // self.q_stride[1])
        if self.window_size > 0:
            x = window_unpartition(x, window, pad_hw, hw)

        return shortcut + x

    def _mlp_path(self, x):
        y = LayerNormFast(name="norm2")(x)
        hidden = int(self.dim_out * self.mlp_ratio)
        bb, hh, ww, cc = y.shape
        yt = y.reshape(bb, hh * ww, cc)  # tokens: plain GEMMs, no conv lowering
        yt = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(yt)
        yt = nn.gelu(yt, approximate=False)
        yt = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(yt)
        return x + yt.reshape(bb, hh, ww, self.dim_out)


class Hiera(nn.Module):
    """Multi-stage trunk returning per-stage NHWC feature maps (/4 … /32)."""
    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (1, 2, 7, 2)
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    q_pool: int = 3
    q_stride: Tuple[int, int] = (2, 2)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    dtype: jnp.dtype = jnp.float32
    fused: bool = False  # fused Pallas block kernels (ops/fused_block.py)
    # Store the background pos embedding at full /4 resolution instead of
    # re-interpolating the (7,7) torch parameterization inside every call
    # (checkpoint loading interpolates once in weights.py/bake_pos_embed;
    # measured effect on the remote v5e was within noise — kept because it
    # removes a per-call convolution and costs nothing).
    baked_pos_embed: bool = True

    @property
    def stage_ends(self):
        return [sum(self.stages[:i]) - 1 for i in range(1, len(self.stages) + 1)]

    @property
    def channel_list(self):
        """Per-stage output channels, low→high stage (i.e. /4 … /32)."""
        return [int(self.embed_dim * self.dim_mul**i) for i in range(len(self.stages))]

    def _pos_embed(self, bkg, win, h, w):
        """Interpolate background embedding to (h, w), tile window embedding.

        When the stored embedding already has shape (1, h, w, C) — baked
        by ``bake_pos_embed`` for a fixed inference size — the per-call
        bicubic resize is skipped entirely.
        """
        if bkg.shape[1:3] == (h, w):
            pos = bkg
        else:
            pos = jax.image.resize(bkg, (1, h, w, bkg.shape[-1]),
                                   method="bicubic")
        wh, ww = win.shape[1], win.shape[2]
        reps_h = -(-h // wh)
        reps_w = -(-w // ww)
        tiled = jnp.tile(win, (1, reps_h, reps_w, 1))[:, :h, :w]
        return pos + tiled

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        x = PatchEmbed(self.embed_dim, dtype=self.dtype,
                       space_to_depth=_S2D_PATCH, name="patch_embed")(x)
        h, w = x.shape[1], x.shape[2]

        bkg_shape = ((h, w) if self.baked_pos_embed
                     else self.window_pos_embed_bkg_spatial_size)
        bkg = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, *bkg_shape, self.embed_dim))
        win = self.param(
            "pos_embed_window", nn.initializers.zeros,
            (1, self.window_spec[0], self.window_spec[0], self.embed_dim))
        x = x + self._pos_embed(bkg, win, h, w).astype(x.dtype)

        depth = sum(self.stages)
        stage_ends = self.stage_ends
        q_pool_blocks = [e + 1 for e in stage_ends[: self.q_pool]]

        outputs = []
        embed_dim, num_heads = self.embed_dim, self.num_heads
        cur_stage = 1
        for i in range(depth):
            dim_out = embed_dim
            window_size = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(embed_dim * self.dim_mul)
                num_heads = int(num_heads * self.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim=embed_dim, dim_out=dim_out, num_heads=num_heads,
                window_size=window_size,
                q_stride=self.q_stride if i in q_pool_blocks else None,
                dtype=self.dtype, fused=self.fused, name=f"blocks_{i}")(x)
            embed_dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs  # list of (B, H_s, W_s, C_s), /4 → /32
