"""Pallas flash attention for TPU.

Used by the Hiera global-attention blocks (4096 tokens at /16 for 1024px
inputs) and the memory attention's cross-attention into the concatenated
memory bank (saber_tpu/models/attention.py and models/memory.py dispatch
here on TPU). Standard online-softmax tiling: the grid walks
(batch·heads, query blocks); each program streams key/value blocks through
VMEM keeping running max/sum statistics in fp32.

Supports an additive key bias vector (used to mask invalid memory-bank
slots / object-pointer tokens); sequence padding is folded into the same
bias, so ragged lengths cost nothing extra.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _online_update(q, k, v, b, scale, acc, m_prev, l_prev):
    """One online-softmax accumulation step. Matmul operands stay in the
    input dtype (bf16 on TPU — fp32 operands would run the MXU at 1/4
    throughput) with fp32 accumulation; scale applies to fp32 logits."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale + b[None, :]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * correction + jnp.dot(p.astype(v.dtype), v,
                                     preferred_element_type=jnp.float32)
    return acc, m_new, l_new


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int,
                  seq_k: int, scale: float):
    """Resident-KV variant: the full (padded) key sequence lives in VMEM;
    the loop walks it in ``block_k`` slices. Cheapest when K/V fit —
    they are fetched once per batch·head row, not once per query block."""
    q = q_ref[0]                                      # (BQ, D), input dtype
    bq = q.shape[0]
    d_out = o_ref.shape[-1]
    num_k = seq_k // block_k

    def body(i, carry):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        # bias rides in an (8, S) replicated layout to satisfy TPU tiling
        b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        return _online_update(q, k, v, b, scale, *carry)

    acc0 = jnp.zeros((bq, d_out), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_streamed(q_ref, k_ref, v_ref, bias_ref, o_ref,
                           acc_ref, m_ref, l_ref, *, scale: float):
    """Streamed-KV variant: key blocks arrive through the innermost grid
    dim with online-softmax state in VMEM scratch. Required when the key
    sequence exceeds VMEM (e.g. a 7-slot memory bank at 1024 px: ~30k
    tokens × 256 dims would need 60 MB resident)."""
    kblk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kblk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    b = bias_ref[0, 0].astype(jnp.float32)
    acc, m, l = _online_update(q_ref[0], k_ref[0], v_ref[0], b, scale,
                               acc_ref[:], m_ref[:], l_ref[:])
    acc_ref[:] = acc
    m_ref[:] = m
    l_ref[:] = l

    @pl.when(kblk == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:]
                    / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    block_q: int = 256, block_k: int = 512,
                    interpret: bool = False) -> jnp.ndarray:
    """Attention over (B, T, H, D) tensors; softmax in fp32.

    bias: optional (B, S) or (S,) additive key bias (e.g. -1e9 on masked
    memory slots). Ragged/padded sequences are handled by folding the pad
    mask into the bias.
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    scale = d**-0.5

    # fold heads into batch; pallas kernel is rank-2 per program
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    t_pad = -(-t // block_q) * block_q
    block_k = min(block_k, -(-s // 128) * 128)
    s_pad = -(-s // block_k) * block_k
    qf = _pad_to(qf, t_pad, 1)
    kf = _pad_to(kf, s_pad, 1)
    vf = _pad_to(vf, s_pad, 1)

    if bias is None:
        bias = jnp.zeros((b, s), jnp.float32)
    else:
        bias = jnp.broadcast_to(jnp.asarray(bias, jnp.float32).reshape(-1, s)
                                if bias.ndim <= 2 else bias, (b, s))
    if s_pad != s:
        bias = jnp.concatenate(
            [bias, jnp.full((b, s_pad - s), _NEG_INF, jnp.float32)], axis=1)
    bias_f = jnp.repeat(bias[:, None], h, axis=1).reshape(b * h, 1, s_pad)
    # TPU block shapes need the 2nd-minor dim divisible by 8
    bias_f = jnp.broadcast_to(bias_f, (b * h, 8, s_pad))

    # resident K/V is cheaper (fetched once per batch·head row) but only
    # legal when both padded K and V plus working set fit in VMEM. The
    # 10 MB budget keeps the default num_maskmem=2 memory bank
    # (S≈8.4k, D=256 → 8.65 MB) on the resident path; block_q·block_k
    # logits and the q/out blocks fit in the remainder.
    kv_bytes = 2 * s_pad * d * jnp.dtype(q.dtype).itemsize + 4 * s_pad * 8
    if kv_bytes <= 10 * 2**20:
        out = pl.pallas_call(
            functools.partial(_flash_kernel, block_k=block_k, seq_k=s_pad,
                              scale=scale),
            grid=(b * h, t_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, 8, s_pad), lambda i, j: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            interpret=interpret,
        )(qf, kf, vf, bias_f)
    else:
        out = pl.pallas_call(
            functools.partial(_flash_kernel_streamed, scale=scale),
            grid=(b * h, t_pad // block_q, s_pad // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j, l: (i, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j, l: (i, l, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j, l: (i, l, 0)),
                pl.BlockSpec((1, 8, block_k), lambda i, j, l: (i, 0, l)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda i, j, l: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
            interpret=interpret,
        )(qf, kf, vf, bias_f)

    out = out[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return out
