"""Attention primitives shared by the SAM2 modules.

Scaled-dot-product attention with a Pallas flash-attention path for TPU
(used by Hiera's global blocks and the memory attention over 4096-token
feature maps) and an XLA einsum path everywhere else / on CPU. The
reference relies on torch.nn.functional.scaled_dot_product_attention
inside the external sam2 package; here the kernel choice is explicit.
"""

import functools

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v):
    """(B, T, H, D) x (B, S, H, D) → (B, T, H, D), fp32 softmax."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


# Flash-attention threshold: below this many query tokens the einsum path is
# faster than paying Pallas launch overhead, and fits VMEM fine.
_FLASH_MIN_SEQ = 1024


@functools.partial(jax.named_call, name="sdpa")
def scaled_dot_product_attention(q, k, v, use_flash: bool | None = None):
    """Attention over (B, T, H, D) tensors (sequence-major, head dim last).

    On TPU with long sequences dispatches to the Pallas flash kernel
    (saber_tpu/ops/flash_attention.py); otherwise the XLA path, which XLA
    fuses well for the short-sequence decoder/prompt attention.
    """
    if use_flash is None:
        d = q.shape[-1]
        use_flash = (
            q.shape[1] >= _FLASH_MIN_SEQ
            and jax.default_backend() == "tpu"
            and 32 <= d <= 256 and d % 8 == 0
        )
    if use_flash:
        try:
            from saber_tpu.ops.flash_attention import flash_attention
            # block sizes tuned on v5e for the hiera global-attention
            # shape (T=S=4096, D=72): 512/4096 measured 9.87 ms vs
            # 10.58 ms at the 256/512 defaults (block_k self-clamps to
            # the padded sequence for shorter inputs)
            return flash_attention(q, k, v, block_q=512, block_k=4096)
        except Exception:
            pass
    return _xla_attention(q, k, v)
