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
