"""Normalization layers shared across the model stack."""

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNormFast(nn.Module):
    """LayerNorm with fp32 statistics and input-dtype elementwise math.

    Keeps per-row mean/rstd in fp32 while the O(N·C) normalize runs at
    the input dtype's bandwidth (flax LayerNorm(dtype=fp32) upcasts the
    whole activation; XLA mostly fuses that anyway — measured effect was
    within noise — but this form guarantees the bf16 elementwise path and
    documents the precision contract). Param tree matches flax LayerNorm
    (scale/bias), so checkpoint conversion is unchanged. With fp32 inputs
    this is exactly standard LayerNorm.
    """
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def ln_grouped(x, scale, bias, groups: int, eps: float = 1e-6):
    """LayerNormFast over the true channel dim of a block-packed lane
    layout: lanes = (block-pixel, c) with c minor, so stats reduce over
    the last ``C = lanes // groups`` of a (…, groups, C) view. fp32
    stats, input-dtype elementwise — identical math to LayerNormFast on
    the unpacked layout. groups=1 is exactly LayerNormFast."""
    lanes = x.shape[-1]
    c = lanes // groups
    xg = x.reshape(*x.shape[:-1], groups, c)
    xf = xg.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xg - mean.astype(x.dtype)) * rstd.astype(x.dtype)
    y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
    return y.reshape(*x.shape[:-1], lanes)


class LnParams(nn.Module):
    """Param holder matching LayerNormFast's tree ({scale, bias}) for
    code paths that consume the params directly (e.g. grouped LN over a
    block-packed lane layout, ``ln_grouped``)."""
    c: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.c,)),
                self.param("bias", nn.initializers.zeros, (self.c,)))
