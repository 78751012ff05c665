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
