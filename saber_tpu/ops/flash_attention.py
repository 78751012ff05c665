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

Optionally applies rotary position embeddings INSIDE the kernel
(``rope_q``/``rope_k`` cos/sin tables) so the memory attention's axial
RoPE never materializes rotated fp32 copies of q/k in HBM
(models/memory.py). Tables use the DE-INTERLEAVED convention: the caller
permutes the q/k projection weights so channel pairs (2i, 2i+1) live at
columns (i, D/2+i); rotation is then two aligned half-lane slices
(a·cos−b·sin, a·sin+b·cos) on the VPU, overlapped with the MXU matmuls.
Attention scores are invariant to the shared permutation, and v is left
unpermuted, so outputs are bit-identical to rotating outside. Token
positions that must NOT rotate (object pointers) carry cos=1, sin=0 rows.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _rot_half(x, cos, sin):
    """Rotate de-interleaved halves: x (N, D) with pair halves at
    [:, :D/2] / [:, D/2:]; cos/sin (N, D/2) fp32. fp32 math, input-dtype
    result — the same contract as position_encoding.apply_rotary_enc."""
    h = x.shape[-1] // 2
    a = x[:, :h].astype(jnp.float32)
    b = x[:, h:].astype(jnp.float32)
    return jnp.concatenate([a * cos - b * sin, a * sin + b * cos],
                           axis=-1).astype(x.dtype)


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


def _flash_kernel_rope(q_ref, k_ref, v_ref, bias_ref, cq_ref, sq_ref,
                       ck_ref, sk_ref, o_ref, *, block_k: int, seq_k: int,
                       scale: float):
    """Resident-KV variant with rotary embeddings fused in: the q block
    and each streamed k slice rotate in VMEM (de-interleaved halves, see
    module docstring) before the score matmul. v is never rotated."""
    q = _rot_half(q_ref[0], cq_ref[:], sq_ref[:])     # (BQ, D)
    bq = q.shape[0]
    d_out = o_ref.shape[-1]
    num_k = seq_k // block_k

    def body(i, carry):
        sl = pl.ds(i * block_k, block_k)
        k = _rot_half(k_ref[0, sl, :], ck_ref[sl, :], sk_ref[sl, :])
        v = v_ref[0, sl, :]
        b = bias_ref[0, 0, sl].astype(jnp.float32)
        return _online_update(q, k, v, b, scale, *carry)

    acc0 = jnp.zeros((bq, d_out), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_streamed_rope(q_ref, k_ref, v_ref, bias_ref, cq_ref,
                                sq_ref, ck_ref, sk_ref, o_ref, acc_ref,
                                m_ref, l_ref, *, scale: float):
    """Streamed-KV variant with fused rotary embeddings (k blocks arrive
    through the innermost grid dim together with their table slices)."""
    kblk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kblk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = _rot_half(q_ref[0], cq_ref[:], sq_ref[:])
    k = _rot_half(k_ref[0], ck_ref[:], sk_ref[:])
    b = bias_ref[0, 0].astype(jnp.float32)
    acc, m, l = _online_update(q, k, v_ref[0], b, scale,
                               acc_ref[:], m_ref[:], l_ref[:])
    acc_ref[:] = acc
    m_ref[:] = m
    l_ref[:] = l

    @pl.when(kblk == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:]
                    / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def preferred_kv_blocking(s0: int, max_block: int = 4608):
    """Pick ``(s_pad, block_k)`` for a key sequence of ``s0`` tokens:
    block_k divides s_pad, is a multiple of 128, stays <= ``max_block``,
    and the number of k-blocks is minimal. Measured on v5e
    (tools/bench_mem{self,cross}_kernel.py): fewer, larger k-blocks win —
    each extra block is an online-softmax rescale pass over the fp32
    accumulator — until the block exceeds ~4.6k rows; padding waste is
    second-order (8256→8448/4224 measured 1.92 ms vs 8256→9216/1024 at
    2.20 ms for the memory-cross shape)."""
    nb = -(-s0 // max_block)
    gran = 128 * nb
    s_pad = -(-s0 // gran) * gran
    return s_pad, s_pad // nb


def _pad_table(tab, n_pad, is_cos):
    """Pad a (n, D/2) rope table to n_pad rows (identity rotation)."""
    pad = n_pad - tab.shape[0]
    if pad <= 0:
        return jnp.asarray(tab, jnp.float32)
    fill = jnp.ones if is_cos else jnp.zeros
    return jnp.concatenate(
        [jnp.asarray(tab, jnp.float32),
         fill((pad, tab.shape[1]), jnp.float32)], axis=0)


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
                    rope_q=None, rope_k=None,
                    interpret: bool = False) -> jnp.ndarray:
    """Attention over (B, T, H, D) tensors; softmax in fp32.

    bias: optional (B, S) or (S,) additive key bias (e.g. -1e9 on masked
    memory slots). Ragged/padded sequences are handled by folding the pad
    mask into the bias.

    rope_q / rope_k: optional (cos, sin) tables of shape (T, D/2) and
    (S, D/2) applying rotary embeddings inside the kernel, in the
    DE-INTERLEAVED half convention (module docstring). Requires
    D % 256 == 0 so each half is a 128-lane-aligned slice; both must be
    given together (q-only or k-only rotation is not a valid RoPE).
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    scale = d**-0.5
    use_rope = rope_q is not None
    if use_rope:
        assert rope_k is not None and d % 256 == 0, \
            "rope needs both tables and D a multiple of 256"

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

    dh = d // 2
    if use_rope:
        cq = _pad_table(rope_q[0], t_pad, True)
        sq = _pad_table(rope_q[1], t_pad, False)
        ck = _pad_table(rope_k[0], s_pad, True)
        sk = _pad_table(rope_k[1], s_pad, False)

    # resident K/V is cheaper (fetched once per batch·head row) but only
    # legal when both padded K and V plus working set fit in VMEM. The
    # 10 MB budget keeps the default num_maskmem=2 memory bank
    # (S≈8.4k, D=256 → 8.65 MB) on the resident path; block_q·block_k
    # logits and the q/out blocks fit in the remainder. Fused-rope k
    # tables (fp32, resident alongside K/V) count against the budget.
    kv_bytes = 2 * s_pad * d * jnp.dtype(q.dtype).itemsize + 4 * s_pad * 8
    if use_rope:
        kv_bytes += 2 * s_pad * dh * 4
    if kv_bytes <= 10 * 2**20:
        in_specs = [
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda i, j: (i, 0, 0)),
        ]
        operands = [qf, kf, vf, bias_f]
        if use_rope:
            kern = functools.partial(_flash_kernel_rope, block_k=block_k,
                                     seq_k=s_pad, scale=scale)
            in_specs += [
                pl.BlockSpec((block_q, dh), lambda i, j: (j, 0)),
                pl.BlockSpec((block_q, dh), lambda i, j: (j, 0)),
                pl.BlockSpec((s_pad, dh), lambda i, j: (0, 0)),
                pl.BlockSpec((s_pad, dh), lambda i, j: (0, 0)),
            ]
            operands += [cq, sq, ck, sk]
        else:
            kern = functools.partial(_flash_kernel, block_k=block_k,
                                     seq_k=s_pad, scale=scale)
        out = pl.pallas_call(
            kern,
            grid=(b * h, t_pad // block_q),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            interpret=interpret,
        )(*operands)
    else:
        in_specs = [
            pl.BlockSpec((1, block_q, d), lambda i, j, l: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, l: (i, l, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, l: (i, l, 0)),
            pl.BlockSpec((1, 8, block_k), lambda i, j, l: (i, 0, l)),
        ]
        operands = [qf, kf, vf, bias_f]
        if use_rope:
            kern = functools.partial(_flash_kernel_streamed_rope, scale=scale)
            in_specs += [
                pl.BlockSpec((block_q, dh), lambda i, j, l: (j, 0)),
                pl.BlockSpec((block_q, dh), lambda i, j, l: (j, 0)),
                pl.BlockSpec((block_k, dh), lambda i, j, l: (l, 0)),
                pl.BlockSpec((block_k, dh), lambda i, j, l: (l, 0)),
            ]
            operands += [cq, sq, ck, sk]
        else:
            kern = functools.partial(_flash_kernel_streamed, scale=scale)
        out = pl.pallas_call(
            kern,
            grid=(b * h, t_pad // block_q, s_pad // block_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda i, j, l: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
            interpret=interpret,
        )(*operands)

    out = out[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return out
