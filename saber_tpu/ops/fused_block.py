"""Fused Pallas kernels for the Hiera MultiScaleBlock hot path.

Round-1 device traces (docs/benchmarks.md) put the hiera-L encoder at
~15% of bf16 peak: GEMMs 61 ms vs 87 ms of standalone LayerNorm reduces,
67 ms of window-partition/unpartition layout copies, and 70 ms of
unfused elementwise — each a full HBM round trip between kernels. These
two kernels keep a block's activations in VMEM across those stages:

- ``fused_window_attention``: LN1 → qkv GEMM → per-window attention →
  output projection → residual, with the window partition/unpartition
  folded into VMEM reshapes (the HBM block fetch is one contiguous row
  of windows, so no strided layout copy ever materializes in HBM).
- ``fused_mlp``: LN2 → fc1 → GELU → fc2 → residual, with the hidden
  dimension streamed in chunks (weights for hiera-L stage 4 exceed VMEM)
  and an fp32 VMEM accumulator.

Both compute bf16 GEMMs with fp32 LayerNorm statistics / softmax /
accumulation — the same precision contract as the unfused flax path
(models/norms.LayerNormFast, models/attention.py), so either path can
serve any checkpoint. CPU tests run the kernels in interpreter mode.

Applicability (checked by callers): attention kernel needs H, W divisible
by the window and no q-pooling / dim change; the MLP kernel handles any
block. Non-qualifying blocks fall back to the flax path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln(x, scale, bias):
    """LayerNormFast semantics: fp32 stats, input-dtype elementwise."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


# ---------------------------------------------------------------------------
# fused windowed attention block
# ---------------------------------------------------------------------------


def _attn_kernel(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, out_ref, *, window, num_heads):
    xb = x_ref[0]                               # (w, W, C)
    w, wd, c = xb.shape
    nwx = wd // window
    t = window * window
    hd = c // num_heads
    dt = xb.dtype

    tokens = xb.reshape(w * wd, c)
    normed = _ln(tokens, s_ref[0], b_ref[0])
    qkv = jnp.dot(normed, wqkv_ref[:],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dt)   # (w·W, 3C)

    # window partition in VMEM: (w, W, 3C) → (nwx·heads, T, 3·hd)
    # (windows and heads fold into ONE batch axis — Mosaic's tpu.matmul
    # supports at most one batch dim)
    qkv = qkv.reshape(w, nwx, window, 3 * c)
    qkv = qkv.transpose(1, 0, 2, 3).reshape(nwx, t, 3 * c)

    def heads_first(a):  # (nwx, T, C) → (nwx·heads, T, hd)
        return (a.reshape(nwx, t, num_heads, hd)
                .transpose(0, 2, 1, 3).reshape(nwx * num_heads, t, hd))

    q = heads_first(qkv[..., :c])
    k = heads_first(qkv[..., c:2 * c])
    v = heads_first(qkv[..., 2 * c:])

    scale = hd ** -0.5
    logits = jnp.einsum("btd,bsd->bts", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    attn = jnp.einsum("bts,bsd->btd", probs, v,
                      preferred_element_type=jnp.float32).astype(dt)

    # unpartition: (nwx·heads, T, hd) → (w·W, C)
    attn = attn.reshape(nwx, num_heads, t, hd).transpose(0, 2, 1, 3)
    attn = attn.reshape(nwx, window, window, c)
    attn = attn.transpose(1, 0, 2, 3).reshape(w * wd, c)
    out = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[0].astype(jnp.float32)
    out_ref[0] = (tokens.astype(jnp.float32) + out).astype(dt).reshape(
        w, wd, c)


@functools.partial(jax.jit, static_argnames=("window", "num_heads"))
def fused_window_attention(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                           *, window: int, num_heads: int):
    """x: (B, H, W, C) with H % window == W % window == 0.

    Returns x + proj(window_attention(LN(x))) — the first half of a
    same-dim MultiScaleBlock (models/hiera.py:119-147).
    """
    b, h, w, c = x.shape
    nwy = h // window
    row = lambda i, j: (i, j, 0, 0)
    const2 = lambda i, j: (0, 0)
    return pl.pallas_call(
        functools.partial(_attn_kernel, window=window, num_heads=num_heads),
        grid=(b, nwy),
        in_specs=[
            pl.BlockSpec((1, window, w, c), row, memory_space=pltpu.ANY
                         if False else pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, window, w, c), row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wqkv,
      bqkv.reshape(1, 3 * c), wproj, bproj.reshape(1, c))


# ---------------------------------------------------------------------------
# fused MLP block
# ---------------------------------------------------------------------------


def _mlp_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, normed_ref, acc_ref):
    hchunk = pl.program_id(1)
    nh = pl.num_programs(1)

    @pl.when(hchunk == 0)
    def _():
        normed_ref[:] = _ln(x_ref[:], s_ref[0], b_ref[0])
        acc_ref[:] = (x_ref[:].astype(jnp.float32)
                      + b2_ref[0].astype(jnp.float32))

    hidden = jnp.dot(normed_ref[:], w1_ref[:],
                     preferred_element_type=jnp.float32)
    hidden = jax.nn.gelu(hidden + b1_ref[0].astype(jnp.float32),
                         approximate=False).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(hidden, w2_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(hchunk == nh - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pick_tile(m: int, target: int = 512) -> int:
    for tm in (target, 256, 128, 64, 32, 16, 8):
        if m % tm == 0:
            return tm
    return m


@jax.jit
def fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """x: (..., C). Returns x + fc2(gelu(fc1(LN(x)))) — the second half of
    a MultiScaleBlock (models/hiera.py:148-155). Hidden dim streams in
    chunks so hiera-L stage-4 weights (8C² bytes) never exceed VMEM."""
    orig_shape = x.shape
    c = x.shape[-1]
    hid = w1.shape[1]
    xt = x.reshape(-1, c)
    m = xt.shape[0]
    tm = _pick_tile(m)
    hc = _pick_tile(hid, 1024)
    grid = (m // tm, hid // hc)

    out = pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, c), x.dtype),        # LN output, reused over j
            pltpu.VMEM((tm, c), jnp.float32),    # fp32 accumulator
        ],
        interpret=_interpret(),
    )(xt, ln_scale.reshape(1, c), ln_bias.reshape(1, c), w1,
      b1.reshape(1, hid), w2, b2.reshape(1, c))
    return out.reshape(orig_shape)
