"""Flash-attention kernel vs exact attention (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from saber_tpu.models.attention import _xla_attention
from saber_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("t,s,d,h", [(256, 256, 64, 2), (300, 300, 64, 1),
                                     (128, 512, 32, 2)])
def test_matches_exact(rng, t, s, d, h):
    q = jnp.asarray(rng.standard_normal((1, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, s, h, d)).astype(np.float32))
    want = np.asarray(_xla_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_bias_masking(rng):
    """-1e9 bias on masked keys reproduces masked exact attention."""
    q = jnp.asarray(rng.standard_normal((2, 128, 1, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 200, 1, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 200, 1, 64)).astype(np.float32))
    bias = np.zeros((2, 200), np.float32)
    bias[:, 150:] = -1e9
    got = np.asarray(flash_attention(q, k, v, bias=jnp.asarray(bias),
                                     block_q=128, block_k=128, interpret=True))
    want = np.asarray(_xla_attention(q, k[:, :150], v[:, :150]))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_streamed_kv_long_sequence(rng):
    """K/V too large for VMEM residency (> 8 MB) take the streamed-KV
    grid path (scratch-carried online softmax) and must still match
    exact attention — this is the 7-slot memory-bank shape class that
    OOM'd the resident kernel at compile time."""
    t, s, d = 128, 16384, 128   # 2*s*d*4B = 16.8 MB on fp32 > 8 MB budget
    q = jnp.asarray(rng.standard_normal((1, t, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, s, 1, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, s, 1, d)).astype(np.float32))
    bias = np.zeros((1, s), np.float32)
    bias[:, s - 500:] = -1e9
    got = np.asarray(flash_attention(q, k, v, bias=jnp.asarray(bias),
                                     block_q=128, block_k=2048,
                                     interpret=True))
    want = np.asarray(_xla_attention(q, k[:, :s - 500], v[:, :s - 500]))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_head_dim_96_and_256(rng):
    for d in (96, 256):
        q = jnp.asarray(rng.standard_normal((1, 128, 2, d)).astype(np.float32))
        got = np.asarray(flash_attention(q, q, q, block_q=128, block_k=128,
                                         interpret=True))
        want = np.asarray(_xla_attention(q, q, q))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_bf16(rng):
    q = jnp.asarray(rng.standard_normal((2, 128, 1, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 128, 1, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 128, 1, 64)), jnp.bfloat16)
    want = np.asarray(_xla_attention(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# Fused RoPE (rotation inside the kernel, de-interleaved halves)
# ---------------------------------------------------------------------------

def _deinterleave(x):
    """Channel pair (2i, 2i+1) -> columns (i, D/2+i) on the last axis."""
    d = x.shape[-1]
    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    return jnp.take(x, jnp.asarray(perm), axis=-1)


@pytest.mark.parametrize("resident", [True, False])
def test_fused_rope_matches_external_rotation(rng, resident):
    """flash(rope inside) == apply_rotary_enc outside + plain flash.

    Covers both kernel variants: resident KV (small S) and streamed KV
    (S past the VMEM budget), with repeated k frames and unrotated
    pointer-token rows (identity cos/sin) — the memory-attention shape
    class (models/memory.py RoPEAttention fused path)."""
    from saber_tpu.models.position_encoding import (apply_rotary_enc,
                                                    compute_axial_cis)

    d = 256
    side = 16
    t = side * side                     # 256 query tokens
    repeats = 2 if resident else 24     # streamed: S*D*2*4B > 10 MB budget
    n_ptr = 64
    s = repeats * t + n_ptr
    q = jnp.asarray(rng.standard_normal((2, t, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, s, 1, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, s, 1, d)).astype(np.float32))
    bias = np.zeros((2, s), np.float32)
    bias[:, -n_ptr // 2:] = -1e9        # half the ptr tokens masked
    freqs = compute_axial_cis(d, side, side)

    qr, kr = apply_rotary_enc(q, k, freqs, repeat_freqs_k=True,
                              num_k_exclude_rope=n_ptr)
    want = np.asarray(flash_attention(qr, kr, v, bias=jnp.asarray(bias),
                                      block_q=128, block_k=256,
                                      interpret=True))

    cos, sin = freqs
    half = d // 2
    ck = jnp.concatenate([jnp.tile(cos, (repeats, 1)),
                          jnp.ones((n_ptr, half), jnp.float32)])
    sk = jnp.concatenate([jnp.tile(sin, (repeats, 1)),
                          jnp.zeros((n_ptr, half), jnp.float32)])
    got = np.asarray(flash_attention(
        _deinterleave(q), _deinterleave(k), v, bias=jnp.asarray(bias),
        block_q=128, block_k=256, rope_q=freqs, rope_k=(ck, sk),
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_rope_attention_module_fused_equals_unfused(rng):
    """RoPEAttention's fused-rope flash path == its XLA path on the same
    params (the module dispatches on backend; here both paths run
    explicitly via the kernel API to validate the permutation logic on
    the self-attention shape: no repeats, no exclusions)."""
    from saber_tpu.models.position_encoding import (apply_rotary_enc,
                                                    compute_axial_cis)

    d, side = 256, 32
    t = side * side
    q = jnp.asarray(rng.standard_normal((1, t, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, t, 1, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, t, 1, d)).astype(np.float32))
    freqs = compute_axial_cis(d, side, side)
    qr, kr = apply_rotary_enc(q, k, freqs)
    want = np.asarray(flash_attention(qr, kr, v, block_q=256, block_k=512,
                                      interpret=True))
    got = np.asarray(flash_attention(
        _deinterleave(q), _deinterleave(k), v, block_q=256, block_k=512,
        rope_q=freqs, rope_k=freqs, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
