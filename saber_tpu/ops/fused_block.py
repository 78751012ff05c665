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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x):
    """Rational-minimax erf (Eigen/XLA f32 scheme), |error| ≤ 4.2e-7.

    Pallas TPU lowering has no erf primitive. Replaces the earlier
    Abramowitz–Stegun 7.1.26 form: same accuracy class but NO exp —
    12 fma + 1 divide. Encoder A/B measured neutral (39.8 slices/s both
    ways: Mosaic pipelines grid steps, hiding the GELU's VPU time under
    the next step's GEMM), kept for the lower VPU pressure.
    """
    xc = jnp.clip(x, -3.832506856900711, 3.832506856900711)
    x2 = xc * xc
    a = jnp.float32(-2.72614225801306e-10)
    for c in (2.77068142495902e-08, -2.10102402082508e-06,
              -5.69250639462346e-05, -7.34990630326855e-04,
              -2.95459980854025e-03, -1.60960333262415e-02):
        a = a * x2 + jnp.float32(c)
    a = a * xc
    b = jnp.float32(-1.45660718464996e-05)
    for c in (-2.13374055278905e-04, -1.68282697438203e-03,
              -7.37332916720468e-03, -1.42647390514189e-02):
        b = b * x2 + jnp.float32(c)
    return a / b


# Diagnostic: SABER_GELU=linear replaces the GELU with identity to bound
# the kernel's VPU share on chip (NOT a correct model — measurement only).
_GELU_MODE = os.environ.get("SABER_GELU", "exact")


def _gelu_exact(x):
    """Exact (erf) GELU matching flax nn.gelu(approximate=False) to
    ~1e-7 — the tanh approximation deviates up to ~3e-3, which would
    break fused-vs-flax equivalence."""
    xf = x.astype(jnp.float32)
    if _GELU_MODE == "linear":
        return xf
    return 0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))


# Diagnostic: SABER_LN=off replaces LayerNorm stats with identity to
# bound the kernels' lane-reduction VPU share on chip (NOT a correct
# model — measurement only). SABER_LN=dot computes the mean/variance
# sums as two skinny MXU dots — measured SLOWER than the VPU reductions
# on chip (mlp s3 1.75 → 1.85 ms, attn s1 5.76 → 5.85: the skinny dots
# serialize against the main GEMM), so exact stays the default; LN=off
# bounds LN at 4-12% of kernel time.
_LN_MODE = os.environ.get("SABER_LN", "exact")


def _ln(x, scale, bias, eps=_EPS):
    """LayerNormFast semantics: fp32 stats, input-dtype elementwise."""
    xf = x.astype(jnp.float32)
    if _LN_MODE == "off":
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)
    if _LN_MODE == "dot":
        c = x.shape[-1]
        ones = jnp.full((c, 1), 1.0 / c, jnp.float32)
        mean = jnp.dot(xf, ones, preferred_element_type=jnp.float32)
        cent = xf - mean
        var = jnp.dot(cent * cent, ones,
                      preferred_element_type=jnp.float32)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


# Diagnostic: SABER_SOFTMAX=linear replaces the softmax exp with a cheap
# elementwise stand-in to bound the attention kernel's exp-VPU share on
# chip (NOT a correct model — measurement only).
_SOFTMAX_MODE = os.environ.get("SABER_SOFTMAX", "exact")


def _softmax(logits):
    """Row softmax, fp32 — jax.nn.softmax semantics."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = (jnp.abs(logits - m) if _SOFTMAX_MODE == "linear"
         else jnp.exp(logits - m))
    return e / jnp.sum(e, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# fused windowed attention block
# ---------------------------------------------------------------------------


def _pad_validity(window, blk_w, valid_hw):
    """(ta, 1) fp32 mask of tokens inside the true (H, W) — for kernels
    running on a window-padded canvas. Token p of a band at grid row j /
    band k sits at spatial (j·window + p//blk_w, k·blk_w + p%blk_w)."""
    h, wd = valid_hw
    j = pl.program_id(1)
    k = pl.program_id(2)
    ta = window * blk_w
    p = jax.lax.broadcasted_iota(jnp.int32, (ta, 1), 0)
    grow = j * window + p // blk_w
    gcol = k * blk_w + p % blk_w
    return ((grow < h) & (gcol < wd)).astype(jnp.float32)


def _attn_kernel(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, *rest, window, heads_per_group, hp,
                 masked, valid_hw=None):
    """One program = a (window, g·window) row-band of tokens × one head
    group. Every tensor stays 2D — (rows, lanes) — because Mosaic only
    supports reshapes that keep the sublane dim a multiple of its tile:
    the window partition becomes a block-diagonal MASK over the band's
    g windows (token p, q interact iff p%blk_w and q%blk_w fall in the
    same width-``window`` column group), heads live in lane slices
    pre-padded to ``hp`` (multiple of 128) columns, and head groups
    stream through the grid's innermost dim with an fp32 accumulator —
    the same revisit pattern as ``fused_mlp``'s hidden chunks. Padded
    head lanes are inert: zero q·kᵀ contributions, zero proj rows.

    The softmax scale is folded into the packed q weights at trace time;
    the block-diagonal mask arrives as a constant VMEM input only when
    the band holds more than one window (``masked``) — stage 3 of
    hiera-L (g == 1) skips the add entirely."""
    mask_ref = rest[0] if masked else None
    out_ref, normed_ref, acc_ref = rest[-3:]
    hgrp = pl.program_id(3)
    nh = pl.num_programs(3)
    xb = x_ref[0]                               # (w, blk_w, C)
    w, blk_w, c = xb.shape
    ta = w * blk_w
    hg = heads_per_group
    dt = xb.dtype

    tokens = xb.reshape(ta, c)                  # leading-dim collapse: legal

    # window-padded canvas: flax/torch pad AFTER the LN, so pad tokens
    # are zero in normed space (they still contribute the qkv bias to
    # in-window attention — exact parity). Computed outside pl.when:
    # program_id has no lowering inside a when-branch in interpret mode.
    valid = (None if valid_hw is None
             else _pad_validity(window, blk_w, valid_hw))

    @pl.when(hgrp == 0)
    def _():
        normed = _ln(tokens, s_ref[0], b_ref[0])
        if valid is not None:
            normed = normed * valid.astype(normed.dtype)
        normed_ref[:] = normed
        acc_ref[:] = (tokens.astype(jnp.float32)
                      + bproj_ref[0].astype(jnp.float32))

    qkv = jnp.dot(normed_ref[:], wqkv_ref[:],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dt)  # (Ta, 3·hg·hp)

    outs = []
    for h in range(hg):                          # lane slices, 128-aligned
        q = qkv[:, h * hp:(h + 1) * hp]
        k = qkv[:, (hg + h) * hp:(hg + h + 1) * hp]
        v = qkv[:, (2 * hg + h) * hp:(2 * hg + h + 1) * hp]
        logits = jax.lax.dot_general(            # q·kᵀ without a transpose
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            logits = logits + mask_ref[:]
        probs = _softmax(logits).astype(dt)
        outs.append(jnp.dot(probs, v,
                            preferred_element_type=jnp.float32).astype(dt))
    attn = jnp.concatenate(outs, axis=-1)        # (Ta, hg·hp)
    acc_ref[:] += jnp.dot(attn, wproj_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(hgrp == nh - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(dt).reshape(w, blk_w, c)


def fused_attention_applicable(h: int, w: int, window: int, c: int,
                               num_heads: int, dtype) -> bool:
    """True when fused_window_attention has a Mosaic-legal block config
    for this shape. Banded blockings cover sublane-aligned windows; the
    PARTITIONED layout covers the rest (window-14/7 stages of hiera
    base/small/tiny) whenever hd is 8-aligned and a one-window block
    fits VMEM — callers use the flax path otherwise."""
    wp = w + (window - w % window) % window
    xb = jnp.dtype(dtype).itemsize
    hd = c // num_heads
    if _pick_attn_blocks(wp // window, window, c, num_heads, hd,
                         xb) is not None:
        return True
    # gb adapts to the batch at dispatch; gb=1 is the fit floor
    return _pick_attn_part(1, window * window, c, num_heads, hd,
                           xb) is not None


def fused_pool_applicable(h: int, w: int, window: int, cin: int, cout: int,
                          num_heads: int, dtype) -> bool:
    """fused_pool_attention analog of ``fused_attention_applicable``."""
    wp = w + (window - w % window) % window
    return _pick_pool_attn_blocks(wp // window, window, cin, cout,
                                  num_heads, cout // num_heads,
                                  jnp.dtype(dtype).itemsize) is not None


def _band_mask(window: int, blk_w: int) -> jnp.ndarray:
    """(ta, ta) block-diagonal window mask for a horizontal band of
    blk_w/window windows (token p belongs to window (p % blk_w) //
    window). Built ONCE in XLA and passed as a constant VMEM input —
    rebuilding it from iotas inside the kernel cost every program ~0.5M
    VPU ops."""
    ta = window * blk_w
    grp = (jnp.arange(ta, dtype=jnp.int32) % blk_w) // window
    return jnp.where(grp[:, None] == grp[None, :], 0.0,
                     -1e9).astype(jnp.float32)


def _pool_band_mask(window: int, blk_w: int) -> jnp.ndarray:
    """(ta/4, ta) mask between 2×2-pooled queries and pre-pool keys of
    the same band (pooled q col' // (window/2) vs kv col // window)."""
    ta = window * blk_w
    qgrp = ((jnp.arange(ta // 4, dtype=jnp.int32) % (blk_w // 2))
            // (window // 2))
    kgrp = (jnp.arange(ta, dtype=jnp.int32) % blk_w) // window
    return jnp.where(qgrp[:, None] == kgrp[None, :], 0.0,
                     -1e9).astype(jnp.float32)


def _scale_q(wqkv, bqkv, c_out, scale):
    """Fold the softmax 1/√hd into the q columns (first ``c_out`` of the
    packed [q|k|v] kernel/bias) — exact: (x·Wq + bq)·s = x·(Wq·s) + bq·s."""
    return (jnp.concatenate([wqkv[:, :c_out] * scale, wqkv[:, c_out:]], 1),
            jnp.concatenate([bqkv[:c_out] * scale, bqkv[c_out:]]))


def _pad_heads(w_cols: jnp.ndarray, num_heads: int, hp: int) -> jnp.ndarray:
    """(…, H·hd) columns → (…, H·hp) zero-padded per head."""
    hd = w_cols.shape[-1] // num_heads
    if hd == hp:
        return w_cols
    shaped = w_cols.reshape(*w_cols.shape[:-1], num_heads, hd)
    pad = [(0, 0)] * (shaped.ndim - 1) + [(0, hp - hd)]
    return jnp.pad(shaped, pad).reshape(*w_cols.shape[:-1], num_heads * hp)


def _attn_vmem(ta, c, hg, hp, wbuf, xbytes):
    return (4 * ta * c * xbytes               # x + out, double-buffered
            + wbuf * c * 3 * hg * hp * xbytes   # wqkv block
            + wbuf * hg * hp * c * xbytes       # wproj block
            + ta * c * xbytes                 # normed scratch
            + ta * c * 4                      # fp32 accumulator
            + ta * 3 * hg * hp * 4            # qkv fp32 pre-cast
            + ta * ta * 8                     # iota pair + mask
            + ta * ta * 4                     # per-head logits
            + ta * hg * hp * xbytes)          # concat attn


# Band token cap: bands of this many tokens per attention program. 256
# fills MXU rows well; smaller caps shrink the block-diagonal masked-logit
# waste (band of g windows computes g× the needed attention FLOPs) at the
# cost of shorter GEMM rows. A/B on chip (hiera-L 1024, batch 8):
# 256 → 193.8 ms, 128 → 195.3 ms, 512 → 194.6 ms — the masked waste is
# cheaper than the lost row utilization, so 256 stays the default.
_ATTN_BAND = int(os.environ.get("SABER_ATTN_BAND", "256"))

# QKV/attention layout inside the fused kernel:
#   "padded"     — per-head lanes zero-padded to 128 (hp); every lane slice
#                  is 128-aligned but the qkv GEMM computes 3·H·128 output
#                  lanes and the proj GEMM contracts over H·128 — a 1.78×
#                  pad for hiera's hd=72 heads.
#   "transposed" — head-packed panels: qkv is computed TRANSPOSED,
#                  (3·hg·hd, Ta) = Wt·normedᵀ with lane-DENSE weights
#                  (hiera-L s4: 3456 = 27 dense 128-panels instead of 48
#                  padded ones), heads are sliced on SUBLANES (hd=72 =
#                  9×8 fp32 rows — tile-aligned, no lane relayout), and
#                  the proj runs as an AᵀB dot whose contraction is the
#                  dense packed H·hd instead of H·128. Per-head attention
#                  GEMMs keep their inherent 72→128 systolic pad either
#                  way; only the qkv/proj pad is removed.
#   "auto"       — transposed for wide stages (num_heads >= 8), padded
#                  below. v5e A/B, hiera-L 1024²/b8 ms/call: s1 5.75/6.23,
#                  s2 2.81/2.97, s3 1.855/1.745, s4 1.770/1.437
#                  (padded/transposed) — the qkv/proj pad saved grows
#                  with H·hd/C while the transposed fixed costs (fp32
#                  head slices + casts) shrink relative to the GEMMs.
#                  Whole-encoder A/B (same session, warm): 175.1 ms
#                  padded vs 172.3 ms auto — −1.6%, ≈ the per-stage
#                  deltas minus scheduling absorption. After the VMEM
#                  budget fix s4 streams (g=4, hg=2): 1.524 vs 1.670
#                  padded (−9%; the unsafe (4,4) pick was 1.437 but
#                  allocated 16.04 MiB > the 16 MiB limit in larger
#                  programs).
_ATTN_LAYOUT = os.environ.get("SABER_ATTN_LAYOUT", "auto")


def _pick_attn_blocks(nwx: int, window: int, c: int, num_heads: int,
                      hd: int, xbytes: int, budget: int = 12 * 2**20):
    """(windows per band g, heads per group hg, padded head width hp),
    or None when no Mosaic-legal configuration exists (caller falls back
    to the flax path).

    Bands of ~_ATTN_BAND tokens keep the masked-logits waste small while
    filling MXU rows. Preference order (all measured on a v5e chip):

    1. PADDED (hp = 128-multiple) weights, all heads, fully VMEM-resident
       — a constant weight-block index means Pallas fetches once with a
       single buffer. 128-aligned per-head lane slices are free. Covers
       stages 1-3. (39.1 slices/s on the hiera-L encoder A/B.)
    2. UNPADDED (hp == hd) all-heads resident — fallback when only the
       0.56x-smaller unpadded weights fit. Mosaic handles the misaligned
       72-lane head slices but pays VPU relayout per head, and the MXU
       pads the 72-lane contraction internally anyway, so this measured
       SLOWER (37.9) than (1) despite doing ~1.78x fewer qkv/proj FLOPs
       — hence second choice.
    3. PADDED with head groups streaming through the innermost grid dim
       — required when no resident variant fits (hiera-L stage 4); an
       unpadded group block of 3·hg·hd lanes is not 128-tileable.
    """
    t = window * window
    band = max(_ATTN_BAND, t)
    hp128 = max(128, -(-hd // 128) * 128)
    # Mosaic block rule: the last two block dims (blk_w, c) must be
    # divisible by (8, 128) or equal the array dims — blk_w = g·window
    # must be a multiple of 8 (or the full padded width). Windows like 14
    # (hiera base/small/tiny stage 3) admit no in-budget g; callers fall
    # back to the flax path when this returns None.
    gs = [g for g in range(min(nwx, max(1, _ATTN_BAND // t)), 0, -1)
          if nwx % g == 0 and ((g * window) % 8 == 0 or g == nwx)]
    if not gs:
        # last resort: ONE full-row band — blk_w == the padded canvas
        # width, which Mosaic allows at any alignment (block dim equals
        # the array dim). Pays g× masked-logit waste but still beats the
        # flax fallback when neither the aligned bands nor the
        # partitioned layout apply (e.g. window 7 at nwx 10 with
        # weights too wide for a resident partitioned block). Bounded to
        # smallish bands; budget tightened for the Mosaic overhead
        # margin (see _pick_attn_blocks_t).
        ta_full = nwx * t
        if ta_full <= 1024:
            for hg in range(num_heads, 0, -1):
                if num_heads % hg:
                    continue
                wbuf = 1 if hg == num_heads else 2
                if _attn_vmem(ta_full, c, hg, hp128, wbuf,
                              xbytes) <= int(10.5 * 2**20):
                    return nwx, hg, hp128
        return None
    for hp_try in (hp128, hd):
        for g in gs:
            ta = g * t
            if (ta <= band and
                    _attn_vmem(ta, c, num_heads, hp_try, 1, xbytes) <= budget):
                return g, num_heads, hp_try
    fallback = None
    for g in gs:
        ta = g * t
        for hg in range(num_heads, 0, -1):
            if num_heads % hg:
                continue
            wbuf = 1 if hg == num_heads else 2
            used = _attn_vmem(ta, c, hg, hp128, wbuf, xbytes)
            if used <= budget and ta <= band:
                return g, hg, hp128
            fallback = (g, hg, hp128)
    return fallback


def _group_qkv_t(wqkv, bqkv, c_out, num_heads, ngroups, hg):
    """Transposed/head-packed layout: rows of the returned
    (ngroups·3·hg·hd, Cin) kernel are [q heads | k heads | v heads] per
    group, hd rows per head — fully lane-dense (the contraction is Cin),
    with NO per-head padding anywhere. Bias returns as a (rows, 1)
    column so it broadcasts over the token lanes of the transposed qkv."""
    hd = c_out // num_heads
    wt = wqkv.T                                   # (3·c_out, cin)
    rows, brows = [], []
    for j in range(ngroups):
        for part in range(3):
            lo = part * c_out + j * hg * hd
            rows.append(wt[lo:lo + hg * hd])
            brows.append(bqkv[lo:lo + hg * hd])
    return jnp.concatenate(rows, 0), jnp.concatenate(brows).reshape(-1, 1)


def _attn_vmem_t(ta, c, hg, hd, wbuf, xbytes):
    n = 3 * hg * hd
    return (4 * ta * c * xbytes               # x + out, double-buffered
            + wbuf * n * c * xbytes           # wqkv_t block
            + wbuf * n * 128 * 4              # (N, 1) bias, lane-padded
            + wbuf * hg * hd * c * xbytes     # wproj row block
            + ta * c * xbytes                 # normed scratch
            + n * ta * 4                      # qkv_t fp32 scratch
            + hg * hd * ta * 4                # out_t fp32 scratch
            + ta * c * 4                      # fp32 accumulator
            + ta * ta * 8                     # mask iotas
            + ta * ta * 4                     # per-head logits
            + 3 * hd * ta * xbytes)           # q/k/v bf16 casts


def _pick_attn_blocks_t(nwx: int, window: int, c: int, num_heads: int,
                        hd: int, xbytes: int,
                        budget: int = int(9.5 * 2**20)):
    """(windows per band g, heads per group hg) for the transposed
    layout, or None (caller falls back to the padded layout). Same band
    legality as ``_pick_attn_blocks``; streamed head groups additionally
    need the weight-block sublane dims (3·hg·hd and hg·hd) tile-aligned,
    and the per-head fp32 sublane slices need hd % 8 == 0.

    Budget is tighter than the padded picker's 12 MiB: Mosaic's actual
    scoped-VMEM allocation runs ~1.36× this estimate (measured: the
    hiera-L s4 (g=4, hg=4) pick estimated 11.8 MiB but allocated
    16.04 MiB — 39 KB OVER the 16 MiB limit inside the one-program AMG
    generate, while squeaking by standalone). 9.5 MiB keeps actual
    usage ≤ ~13 MiB; s4 now streams (g=4, hg=2), s3 stays resident."""
    if hd % 8:
        return None
    t = window * window
    band = max(_ATTN_BAND, t)
    sub = 16 if xbytes == 2 else 8
    gs = [g for g in range(min(nwx, max(1, _ATTN_BAND // t)), 0, -1)
          if nwx % g == 0 and ((g * window) % 8 == 0 or g == nwx)]
    if not gs:
        return None
    for g in gs:                 # resident: all heads, single weight buffer
        ta = g * t
        if (ta <= band and
                _attn_vmem_t(ta, c, num_heads, hd, 1, xbytes) <= budget):
            return g, num_heads
    fallback = None
    for g in gs:                 # streamed head groups
        ta = g * t
        for hg in range(num_heads, 0, -1):
            if (num_heads % hg or (3 * hg * hd) % sub
                    or (hg * hd) % sub):
                continue
            used = _attn_vmem_t(ta, c, hg, hd, 2, xbytes)
            if used <= budget and ta <= band:
                return g, hg
            fallback = (g, hg)
    return fallback


def _attn_kernel_t(x_ref, s_ref, b_ref, wqkvt_ref, bqkvt_ref, wproj_ref,
                   bproj_ref, *rest, window, heads_per_group, hd,
                   masked, valid_hw=None):
    """Transposed-layout program: one (window, g·window) row-band × one
    head group, with qkv computed as (3·hg·hd, Ta) = W_packed · normedᵀ
    (an ABᵀ dot — both contractions ride lanes). Heads are SUBLANE
    slices of the fp32 qkv scratch (hd multiples of 8 — tile-aligned, no
    lane relayout), per-head attention runs AᵀB / ABᵀ against the
    transposed operands, and the output projection contracts the packed
    (hg·hd, Ta) attention result against the UNMODIFIED wproj rows —
    every GEMM is lane-dense except the inherent hd→128 systolic pad
    inside the per-head dots."""
    mask_ref = rest[0] if masked else None
    out_ref, normed_ref, qkvt_ref, outt_ref, acc_ref = rest[-5:]
    hgrp = pl.program_id(3)
    nh = pl.num_programs(3)
    xb = x_ref[0]                               # (w, blk_w, C)
    w, blk_w, c = xb.shape
    ta = w * blk_w
    hg = heads_per_group
    dt = xb.dtype

    tokens = xb.reshape(ta, c)
    valid = (None if valid_hw is None
             else _pad_validity(window, blk_w, valid_hw))

    @pl.when(hgrp == 0)
    def _():
        normed = _ln(tokens, s_ref[0], b_ref[0])
        if valid is not None:
            normed = normed * valid.astype(normed.dtype)
        normed_ref[:] = normed
        acc_ref[:] = (tokens.astype(jnp.float32)
                      + bproj_ref[0].astype(jnp.float32))

    qkvt = jax.lax.dot_general(                 # (3·hg·hd, Ta), ABᵀ
        wqkvt_ref[:], normed_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkvt_ref[:] = qkvt + bqkvt_ref[:].astype(jnp.float32)

    for h in range(hg):                         # sublane slices, 8-aligned
        q = qkvt_ref[pl.ds(h * hd, hd), :].astype(dt)
        k = qkvt_ref[pl.ds((hg + h) * hd, hd), :].astype(dt)
        logits = jax.lax.dot_general(           # (Ta, Ta), AᵀB
            q, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            logits = logits + mask_ref[:]
        probs = _softmax(logits).astype(dt)
        v = qkvt_ref[pl.ds((2 * hg + h) * hd, hd), :].astype(dt)
        outt_ref[pl.ds(h * hd, hd), :] = jax.lax.dot_general(
            v, probs, (((1,), (1,)), ((), ())),   # (hd, Ta), ABᵀ
            preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(          # (Ta, C), AᵀB — dense K
        outt_ref[:].astype(dt), wproj_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(hgrp == nh - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(dt).reshape(w, blk_w, c)


def _window_attention_t(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                        window, num_heads, valid_hw, picked):
    """Transposed-layout dispatch for ``fused_window_attention`` (inputs
    already canvas-padded; ``picked`` from ``_pick_attn_blocks_t``)."""
    b, h, w, c = x.shape
    nwy = h // window
    nwx = w // window
    hd = c // num_heads
    g, hg = picked
    ngroups = num_heads // hg

    wqkv_s, bqkv_s = _scale_q(wqkv, bqkv, c, hd ** -0.5)
    wqkvt, bqkvt = _group_qkv_t(wqkv_s, bqkv_s, c, num_heads, ngroups, hg)

    n = 3 * hg * hd
    blk_w = g * window
    masked = g > 1
    operands = [x, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wqkvt,
                bqkvt, wproj, bproj.reshape(1, c)]
    in_specs = [
        pl.BlockSpec((1, window, blk_w, c), lambda i, j, k, l: (i, j, k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, c), lambda i, j, k, l: (l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1), lambda i, j, k, l: (l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hg * hd, c), lambda i, j, k, l: (l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if masked:
        operands.append(_band_mask(window, blk_w))
        in_specs.append(pl.BlockSpec((window * blk_w, window * blk_w),
                                     lambda i, j, k, l: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_attn_kernel_t, window=window,
                          heads_per_group=hg, hd=hd, masked=masked,
                          valid_hw=valid_hw),
        grid=(b, nwy, nwx // g, ngroups),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, window, blk_w, c),
                               lambda i, j, k, l: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((window * blk_w, c), x.dtype),       # LN output
            pltpu.VMEM((n, window * blk_w), jnp.float32),   # qkvᵀ
            pltpu.VMEM((hg * hd, window * blk_w), jnp.float32),  # attnᵀ
            pltpu.VMEM((window * blk_w, c), jnp.float32),   # accumulator
        ],
        interpret=_interpret(),
    )(*operands)


def _attn_vmem_part(gb, t, c, num_heads, hd, xbytes):
    n = 3 * num_heads * hd
    tl = -(-t // 128) * 128                   # lane-padded token dim
    ts = -(-t // 8) * 8                       # sublane-padded token dim
    return (4 * gb * ts * c * xbytes          # x + out, double-buffered
            + n * c * xbytes                  # wqkv_t, resident
            + num_heads * hd * c * xbytes     # wproj, resident
            + n * 128 * 4                     # (n, 1) bias, lane-padded
            + n * tl * 4                      # qkvt fp32 scratch
            + num_heads * hd * tl * 4         # packed attn output value
            + ts * c * (xbytes + 4)           # normed + fp32 accumulator
            + ts * tl * 8)                    # logits + probs


# SABER_ATTN_PART=0 disables the partitioned layout (flax fallback, the
# pre-round-5 behavior for window-14/7 stages) — A/B and revert knob.
_ATTN_PART = os.environ.get("SABER_ATTN_PART", "1") == "1"


def _pick_attn_part(nw, t, c, num_heads, hd, xbytes,
                    budget: int = int(9.5 * 2**20)):
    """Windows-per-program ``gb`` for the PARTITIONED layout, or None.

    Covers windows whose token count t = window² is not sublane-aligned
    (hiera base/small/tiny stages 3-4: window 14 → t 196, window 7 →
    t 49), where no banded blocking is Mosaic-legal. The caller window-
    partitions to (nW, t, C) in XLA first; a (gb, t, C) block is then
    legal for ANY t because both trailing block dims equal the array
    dims. All heads stay resident (one grid visit per block — scratch
    never persists across programs, so t needs no alignment anywhere);
    per-head q/k/v are 8-aligned SUBLANE slices of the transposed qkv
    scratch, as in the banded transposed layout.

    v5e A/B (hiera-base 1024²/b8, in-session): encoder 102.4 ms with the
    flax fallback → 96.2 ms partitioned (−6%). SABER_ATTN_PART=0
    reverts."""
    if not _ATTN_PART or hd % 8 or nw < 1:
        return None
    cap = max(1, 1024 // t)
    for gb in range(min(nw, cap), 0, -1):
        if nw % gb == 0 and _attn_vmem_part(gb, t, c, num_heads, hd,
                                            xbytes) <= budget:
            return gb
    return None


def _attn_kernel_part(x_ref, s_ref, b_ref, wqkvt_ref, bqkvt_ref, wproj_ref,
                      bproj_ref, out_ref, qkvt_ref, *, gb, num_heads, hd,
                      window, nwy, nwx, valid_hw):
    """Partitioned-layout program: ``gb`` whole windows (leading block
    dim), all heads resident, transposed qkv math — see
    ``_pick_attn_part``. The canvas-pad validity is recomputed from the
    global window index (grid is flat over B·nwy·nwx)."""
    t = window * window
    dt = x_ref.dtype
    for wdx in range(gb):
        xw = x_ref[wdx]                          # (t, C)
        normed = _ln(xw, s_ref[0], b_ref[0])
        if valid_hw is not None:
            widx = pl.program_id(0) * gb + wdx
            wy = (widx // nwx) % nwy
            wx = widx % nwx
            p = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
            row = wy * window + p // window
            col = wx * window + p % window
            valid = ((row < valid_hw[0]) & (col < valid_hw[1]))
            normed = normed * valid.astype(normed.dtype)
        qkvt = jax.lax.dot_general(              # (3·H·hd, t), ABᵀ
            wqkvt_ref[:], normed, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkvt_ref[:] = qkvt + bqkvt_ref[:].astype(jnp.float32)
        outs = []
        for h in range(num_heads):               # 8-aligned sublane slices
            q = qkvt_ref[pl.ds(h * hd, hd), :].astype(dt)
            k = qkvt_ref[pl.ds((num_heads + h) * hd, hd), :].astype(dt)
            logits = jax.lax.dot_general(        # (t, t), AᵀB
                q, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            probs = _softmax(logits).astype(dt)
            v = qkvt_ref[pl.ds((2 * num_heads + h) * hd, hd), :].astype(dt)
            outs.append(jax.lax.dot_general(     # (hd, t), ABᵀ
                v, probs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt))
        outt = jnp.concatenate(outs, 0)          # (H·hd, t)
        acc = xw.astype(jnp.float32) + bproj_ref[0].astype(jnp.float32)
        acc = acc + jax.lax.dot_general(         # (t, C), AᵀB — dense K
            outt, wproj_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[wdx] = acc.astype(dt)


def _window_attention_part(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                           window, num_heads, valid_hw, gb):
    """Partitioned-layout dispatch: XLA window partition → flat Pallas
    grid over windows → unpartition (input already canvas-padded)."""
    b, h, w, c = x.shape
    nwy = h // window
    nwx = w // window
    t = window * window
    hd = c // num_heads
    nw = b * nwy * nwx
    n = 3 * num_heads * hd

    wqkv_s, bqkv_s = _scale_q(wqkv, bqkv, c, hd ** -0.5)
    wqkvt, bqkvt = _group_qkv_t(wqkv_s, bqkv_s, c, num_heads, 1, num_heads)

    xp = (x.reshape(b, nwy, window, nwx, window, c)
          .transpose(0, 1, 3, 2, 4, 5).reshape(nw, t, c))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_part, gb=gb, num_heads=num_heads,
                          hd=hd, window=window, nwy=nwy, nwx=nwx,
                          valid_hw=valid_hw),
        grid=(nw // gb,),
        in_specs=[
            pl.BlockSpec((gb, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, t, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, t), jnp.float32)],
        interpret=_interpret(),
    )(xp, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wqkvt, bqkvt,
      wproj, bproj.reshape(1, c))
    return (out.reshape(b, nwy, nwx, window, window, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c))


@functools.partial(jax.jit,
                   static_argnames=("window", "num_heads", "layout"))
def fused_window_attention(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                           *, window: int, num_heads: int,
                           layout: Optional[str] = None):
    """x: (B, H, W, C), any H/W — non-multiples of ``window`` run on a
    zero-padded canvas with in-kernel validity masking (exact flax/torch
    pad-after-LN semantics) and the output is cropped back.

    Returns x + proj(window_attention(LN(x))) — the first half of a
    same-dim MultiScaleBlock (models/hiera.py:119-147).

    ``layout``: None → the SABER_ATTN_LAYOUT env default; "padded" /
    "transposed" force a kernel layout (see ``_ATTN_LAYOUT``). The
    transposed layout falls back to padded when its picker finds no
    legal blocking.
    """
    if layout is None:
        layout = _ATTN_LAYOUT
    if layout == "auto":
        layout = "transposed" if num_heads >= 8 else "padded"
    b, h0, w0, c = x.shape
    pad_h = (window - h0 % window) % window
    pad_w = (window - w0 % window) % window
    valid_hw = (h0, w0) if (pad_h or pad_w) else None
    if valid_hw is not None:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    b, h, w, c = x.shape
    nwy = h // window
    nwx = w // window
    t = window * window
    hd = c // num_heads
    if layout == "transposed":
        picked_t = _pick_attn_blocks_t(nwx, window, c, num_heads, hd,
                                       jnp.dtype(x.dtype).itemsize)
        if picked_t is not None:
            out = _window_attention_t(x, ln_scale, ln_bias, wqkv, bqkv,
                                      wproj, bproj, window, num_heads,
                                      valid_hw, picked_t)
            return out[:, :h0, :w0] if valid_hw is not None else out
    picked = _pick_attn_blocks(nwx, window, c, num_heads, hd,
                               jnp.dtype(x.dtype).itemsize)
    if picked is None:
        # no banded blocking (t = window² not sublane-aligned — window 14
        # / 7 stages of hiera base/small/tiny): partition in XLA and run
        # the flat per-window kernel
        gb = _pick_attn_part(b * nwy * nwx, t, c, num_heads, hd,
                             jnp.dtype(x.dtype).itemsize)
        if gb is not None:
            out = _window_attention_part(x, ln_scale, ln_bias, wqkv, bqkv,
                                         wproj, bproj, window, num_heads,
                                         valid_hw, gb)
            return out[:, :h0, :w0] if valid_hw is not None else out
        raise ValueError(
            f"no Mosaic-legal band for window={window}, W={w} — gate "
            "with fused_attention_applicable() and use the flax path")
    g, hg, hp = picked
    ngroups = num_heads // hg

    # repack weights head-padded and GROUPED: for each head group,
    # [q cols | k cols | v cols] of that group's heads are contiguous, so
    # the (c, 3·hg·hp) weight block for grid step j is one lane slice;
    # the softmax scale rides the q columns (trace-time, exact)
    wqkv_s, bqkv_s = _scale_q(wqkv, bqkv, c, hd ** -0.5)
    wqkv_p, bqkv_p = _group_qkv(wqkv_s, bqkv_s, c, num_heads, hp,
                                ngroups, hg)
    wproj_p = _pad_heads(wproj.T, num_heads, hp).T      # (H·hp, C), head-major

    d3 = 3 * num_heads * hp
    blk_w = g * window
    masked = g > 1
    operands = [x, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wqkv_p,
                bqkv_p.reshape(1, d3), wproj_p, bproj.reshape(1, c)]
    in_specs = [
        pl.BlockSpec((1, window, blk_w, c), lambda i, j, k, l: (i, j, k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3 * hg * hp), lambda i, j, k, l: (0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * hg * hp), lambda i, j, k, l: (0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hg * hp, c), lambda i, j, k, l: (l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if masked:
        operands.append(_band_mask(window, blk_w))
        in_specs.append(pl.BlockSpec((window * blk_w, window * blk_w),
                                     lambda i, j, k, l: (0, 0),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, window=window, heads_per_group=hg,
                          hp=hp, masked=masked, valid_hw=valid_hw),
        grid=(b, nwy, nwx // g, ngroups),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, window, blk_w, c),
                               lambda i, j, k, l: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((window * blk_w, c), x.dtype),   # LN output
            pltpu.VMEM((window * blk_w, c), jnp.float32),  # accumulator
        ],
        interpret=_interpret(),
    )(*operands)
    return out[:, :h0, :w0] if valid_hw is not None else out


# ---------------------------------------------------------------------------
# fused q-pool transition block (stage boundaries: dim doubles, 2×2 q pool)
# ---------------------------------------------------------------------------


def _pool2_tokens(x2, blk_w):
    """2×2 max pool on a (ta, X) token band (rows ordered r·blk_w + c),
    exact nn.max_pool((2, 2)) semantics, Mosaic-safe: strided sublane
    slices lower to unsupported gathers, so instead (a) two sublane
    rolls compute the 4-neighbour max at every even-(r, c) row (the
    wrap rows are never selected), and (b) one 0/1 selection matmul
    compacts the tq = ta/4 pooled rows — exact, and trivial on the MXU
    (tq·ta·X ≪ the qkv GEMM)."""
    ta = x2.shape[0]
    tq = ta // 4
    m = jnp.maximum(x2, pltpu.roll(x2, shift=ta - 1, axis=0))
    m = jnp.maximum(m, pltpu.roll(m, shift=ta - blk_w, axis=0))
    pi = jax.lax.broadcasted_iota(jnp.int32, (tq, ta), 0)
    qi = jax.lax.broadcasted_iota(jnp.int32, (tq, ta), 1)
    src = 2 * (pi // (blk_w // 2)) * blk_w + 2 * (pi % (blk_w // 2))
    sel = (qi == src).astype(x2.dtype)
    return jax.lax.dot_general(sel, m, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pool_attn_kernel(x_ref, s_ref, b_ref, wsh_ref, bsh_ref, wqkv_ref,
                      bqkv_ref, wproj_ref, bproj_ref, *rest,
                      window, heads_per_group, hp, masked, valid_hw=None):
    """One program = a (window, g·window) pre-pool row-band × one head
    group. Same 2D-tensor discipline as ``_attn_kernel``; the query side
    is 2×2 max-pooled inside the band (column pairs never cross a window
    boundary, so band-level pooling ≡ the flax path's per-window pooling,
    models/hiera.py MultiScaleAttention). The projected shortcut is
    pooled the same way and seeds the accumulator. Softmax scale rides
    the packed q weights; the window mask is a constant input when the
    band holds more than one window."""
    mask_ref = rest[0] if masked else None
    out_ref, normed_ref, acc_ref = rest[-3:]
    hgrp = pl.program_id(3)
    nh = pl.num_programs(3)
    xb = x_ref[0]                                # (w, blk_w, cin)
    w, blk_w, cin = xb.shape
    ta = w * blk_w
    tq = ta // 4
    hg = heads_per_group
    dt = xb.dtype
    cout = wsh_ref.shape[1]

    tokens = xb.reshape(ta, cin)

    valid = (None if valid_hw is None
             else _pad_validity(window, blk_w, valid_hw))

    @pl.when(hgrp == 0)
    def _():
        normed = _ln(tokens, s_ref[0], b_ref[0])
        if valid is not None:
            normed = normed * valid.astype(normed.dtype)
        normed_ref[:] = normed
        sc = jnp.dot(normed_ref[:], wsh_ref[:],
                     preferred_element_type=jnp.float32)
        sc = sc + bsh_ref[0].astype(jnp.float32)
        acc_ref[:] = (_pool2_tokens(sc, blk_w)
                      + bproj_ref[0].astype(jnp.float32))

    qkv32 = jnp.dot(normed_ref[:], wqkv_ref[:],
                    preferred_element_type=jnp.float32)
    qkv32 = qkv32 + bqkv_ref[0].astype(jnp.float32)   # (ta, 3·hg·hp)

    d = hg * hp
    # pool queries in fp32 — Mosaic's rotate (pltpu.roll) is 32-bit only
    qp = _pool2_tokens(qkv32[:, :d], blk_w).astype(dt)
    qkv = qkv32.astype(dt)

    outs = []
    for h in range(hg):
        q = qp[:, h * hp:(h + 1) * hp]
        k = qkv[:, (hg + h) * hp:(hg + h + 1) * hp]
        v = qkv[:, (2 * hg + h) * hp:(2 * hg + h + 1) * hp]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            logits = logits + mask_ref[:]
        probs = _softmax(logits).astype(dt)
        outs.append(jnp.dot(probs, v,
                            preferred_element_type=jnp.float32).astype(dt))
    attn = jnp.concatenate(outs, axis=-1)        # (tq, hg·hp)
    acc_ref[:] += jnp.dot(attn, wproj_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(hgrp == nh - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(dt).reshape(w // 2, blk_w // 2, cout)


def _group_qkv(wqkv, bqkv, c_out, num_heads, hp, ngroups, hg):
    """Pack a (cin, 3·c_out) qkv kernel head-padded and GROUPED: for each
    head group, [q | k | v] columns of that group's heads are contiguous,
    so grid step l reads one lane slice. Shared by the same-dim and the
    q-pool fused attention kernels."""
    def grouped(m, is_bias=False):
        mm = m[None] if is_bias else m
        parts = [_pad_heads(mm[..., i * c_out:(i + 1) * c_out], num_heads, hp)
                 .reshape(*mm.shape[:-1], num_heads, hp)
                 for i in range(3)]
        groups = []
        for j in range(ngroups):
            sl = slice(j * hg, (j + 1) * hg)
            groups.extend(p[..., sl, :].reshape(*mm.shape[:-1], hg * hp)
                          for p in parts)
        out = jnp.concatenate(groups, axis=-1)
        return out[0] if is_bias else out
    return grouped(wqkv), grouped(bqkv, is_bias=True)


def _pool_attn_vmem(ta, cin, cout, hg, hp, wbuf, xbytes):
    tq = ta // 4
    return (2 * ta * cin * xbytes             # x, double-buffered
            + 2 * tq * cout * xbytes          # out, double-buffered
            + cin * cout * xbytes             # wshort (constant index)
            + wbuf * cin * 3 * hg * hp * xbytes   # wqkv block
            + wbuf * hg * hp * cout * xbytes      # wproj block
            + ta * cin * xbytes               # normed scratch
            + tq * cout * 4                   # fp32 accumulator
            + ta * cout * 4                   # shortcut fp32 (pre-pool)
            + ta * 3 * hg * hp * 4            # qkv fp32 pre-cast
            + tq * ta * 8 + tq * ta * 4       # mask iotas + logits
            + ta * hg * hp * xbytes)          # q3/attn temporaries


def _pick_pool_attn_blocks(nwx, window, cin, cout, num_heads, hd, xbytes,
                           budget=12 * 2**20):
    """(g, hg, hp) for the q-pool kernel — same preference order as
    ``_pick_attn_blocks`` (resident padded → streamed head groups), or
    None when no Mosaic-legal g exists. Legality covers both the input
    band (blk_w % 8) and the pooled output block (blk_w/2 % 8), i.e.
    g·window % 16 — or the full-width band."""
    t = window * window
    band = max(_ATTN_BAND, t)
    hp128 = max(128, -(-hd // 128) * 128)
    gs = [g for g in range(min(nwx, max(1, _ATTN_BAND // t)), 0, -1)
          if nwx % g == 0 and ((g * window) % 16 == 0 or g == nwx)]
    if not gs:
        return None
    for g in gs:
        ta = g * t
        if (ta <= band and _pool_attn_vmem(
                ta, cin, cout, num_heads, hp128, 1, xbytes) <= budget):
            return g, num_heads, hp128
    fallback = None
    for g in gs:
        ta = g * t
        for hg in range(num_heads, 0, -1):
            if num_heads % hg:
                continue
            wbuf = 1 if hg == num_heads else 2
            used = _pool_attn_vmem(ta, cin, cout, hg, hp128, wbuf, xbytes)
            if used <= budget and ta <= band:
                return g, hg, hp128
            fallback = (g, hg, hp128)
    return fallback


@functools.partial(jax.jit, static_argnames=("window", "num_heads"))
def fused_pool_attention(x, ln_scale, ln_bias, wshort, bshort, wqkv, bqkv,
                         wproj, bproj, *, window: int, num_heads: int):
    """Stage-transition half-block: returns
    maxpool2(Dense_proj(LN(x))) + proj(attn(pool_q(qkv(LN(x))))) at half
    resolution and ``cout = wshort.shape[1]`` channels — the q-pool
    branch of MultiScaleBlock (models/hiera.py _attention_path, torch
    hiera q_stride semantics). Requires even H, W and ``window``; H/W
    that aren't window multiples run on a zero-padded canvas with
    pad-after-LN validity masking (exact flax/torch parity) and the
    output is cropped back to (H/2, W/2)."""
    b, h0, w0, cin = x.shape
    pad_h = (window - h0 % window) % window
    pad_w = (window - w0 % window) % window
    valid_hw = (h0, w0) if (pad_h or pad_w) else None
    if valid_hw is not None:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    b, h, w, cin = x.shape
    cout = wshort.shape[1]
    nwy = h // window
    nwx = w // window
    t = window * window
    hd = cout // num_heads
    picked = _pick_pool_attn_blocks(nwx, window, cin, cout, num_heads, hd,
                                    jnp.dtype(x.dtype).itemsize)
    if picked is None:
        raise ValueError(
            f"no Mosaic-legal band for window={window}, W={w} — gate "
            "with fused_pool_applicable() and use the flax path")
    g, hg, hp = picked
    ngroups = num_heads // hg

    wqkv_s, bqkv_s = _scale_q(wqkv, bqkv, cout, hd ** -0.5)
    wqkv_p, bqkv_p = _group_qkv(wqkv_s, bqkv_s, cout, num_heads, hp,
                                ngroups, hg)
    wproj_p = _pad_heads(wproj.T, num_heads, hp).T      # (H·hp, cout)

    d3 = 3 * num_heads * hp
    blk_w = g * window
    masked = g > 1
    operands = [x, ln_scale.reshape(1, cin), ln_bias.reshape(1, cin),
                wshort, bshort.reshape(1, cout), wqkv_p,
                bqkv_p.reshape(1, d3), wproj_p, bproj.reshape(1, cout)]
    in_specs = [
        pl.BlockSpec((1, window, blk_w, cin),
                     lambda i, j, k, l: (i, j, k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, cout), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, 3 * hg * hp), lambda i, j, k, l: (0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * hg * hp), lambda i, j, k, l: (0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hg * hp, cout), lambda i, j, k, l: (l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i, j, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if masked:
        operands.append(_pool_band_mask(window, blk_w))
        in_specs.append(pl.BlockSpec(
            (window * blk_w // 4, window * blk_w),
            lambda i, j, k, l: (0, 0), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_pool_attn_kernel, window=window,
                          heads_per_group=hg, hp=hp, masked=masked,
                          valid_hw=valid_hw),
        grid=(b, nwy, nwx // g, ngroups),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, window // 2, blk_w // 2, cout),
                               lambda i, j, k, l: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((window * blk_w, cin), x.dtype),      # LN output
            pltpu.VMEM((window * blk_w // 4, cout), jnp.float32),  # acc
        ],
        interpret=_interpret(),
    )(*operands)
    return (out[:, :h0 // 2, :w0 // 2] if valid_hw is not None else out)


# ---------------------------------------------------------------------------
# fused MLP block
# ---------------------------------------------------------------------------


def _mlp_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, normed_ref, acc_ref, *, activation="gelu",
                eps=_EPS):
    hchunk = pl.program_id(1)
    nh = pl.num_programs(1)

    @pl.when(hchunk == 0)
    def _():
        normed_ref[:] = _ln(x_ref[:], s_ref[0], b_ref[0], eps=eps)
        acc_ref[:] = (x_ref[:].astype(jnp.float32)
                      + b2_ref[0].astype(jnp.float32))

    hidden = jnp.dot(normed_ref[:], w1_ref[:],
                     preferred_element_type=jnp.float32)
    hidden = hidden + b1_ref[0].astype(jnp.float32)
    hidden = (jnp.maximum(hidden, 0.0) if activation == "relu"
              else _gelu_exact(hidden)).astype(x_ref.dtype)
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


def _hidden_chunks(hid: int, target: int = 1024):
    """128-multiple divisors of ``hid`` ≤ target, descending; plus ``hid``
    whole if small (Mosaic requires lane-dim blocks divisible by 128 or
    full-size)."""
    out = [hid] if hid <= target else []
    for mult in range(target // 128, 0, -1):
        if hid % (128 * mult) == 0:
            out.append(128 * mult)
    return out or [hid]


# measured on hiera-L/1024 (v5e): 12 MB → 39.8 slices/s, 13.5 → 40.5,
# 14.5 → 40.8 in the ENCODER bench — but both raised values OOM the
# 16 MB scoped-vmem limit when the same stage-4 kernel compiles inside
# the fused-direction scan (Mosaic stack temps exceed the footprint
# model by up to ~4 MB there), so the shipped default stays at the
# known-safe 12; the knob remains for standalone-encoder tuning
_MLP_BUDGET = int(float(os.environ.get("SABER_MLP_VMEM_MB", "12")) * 2**20)


# Diagnostic: force a specific (row tile, hidden chunk), e.g.
# SABER_MLP_FORCE=512,1152 — for on-chip block sweeps only.
_MLP_FORCE = os.environ.get("SABER_MLP_FORCE", "")


def _pick_mlp_blocks(m: int, c: int, hid: int, xbytes: int,
                     budget: int = 0):
    budget = budget or _MLP_BUDGET
    if _MLP_FORCE:
        tm, hc = (int(v) for v in _MLP_FORCE.split(","))
        if m % tm == 0 and hid % hc == 0:
            return tm, hc
    """Largest (row tile, hidden chunk) whose VMEM footprint fits.

    Footprint model: double-buffered x/out tiles and w1/w2 blocks, the
    LN scratch, fp32 accumulator, and the fp32 hidden intermediate. Row
    tile is prioritized — weight re-streaming scales with m/tm, so a
    bigger tm saves far more HBM traffic than a bigger hc. The default
    budget (``SABER_MLP_VMEM_MB``, see ``_MLP_BUDGET``) leaves headroom
    under the 16 MB scoped-vmem limit (stack temps, Mosaic padding)."""
    fallback = None
    # pass 1: whole hidden dim resident (hc == hid → constant weight block
    # index → Pallas fetches w1/w2 once, single-buffered, for the entire
    # grid — no re-streaming as row tiles advance); pass 2: stream chunks.
    # Row tiles above 512 only fit the narrow early stages, where they
    # help: stage 1 (C=144) measured 5.29 → 5.06 ms/block at tm=2048.
    for resident in (True, False):
        for tm in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
            if m % tm:
                continue
            for hc in ([hid] if resident else _hidden_chunks(hid)):
                wbuf = 1 if hc == hid else 2
                used = (4 * tm * c * xbytes      # x + out, double-buffered
                        + 2 * wbuf * c * hc * xbytes  # w1 + w2
                        + tm * c * xbytes        # normed scratch
                        + tm * c * 4             # fp32 accumulator
                        + tm * hc * 4            # fp32 hidden temp
                        + 2 * hc * 4 + 2 * c * 4)  # biases / LN params
                if used <= budget:
                    return tm, hc
                fallback = (tm, hc)              # smallest combo seen
    return fallback if fallback is not None else (m, hid)


@functools.partial(jax.jit, static_argnames=("activation", "eps"))
def fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, activation="gelu",
              eps=_EPS):
    """x: (..., C). Returns x + fc2(act(fc1(LN(x)))) — the second half of
    a MultiScaleBlock (models/hiera.py:148-155) with act=gelu, or the
    MemoryAttentionLayer FFN (models/memory.py) with act=relu/eps=1e-5.
    Hidden dim streams in chunks so hiera-L stage-4 weights (8C² bytes)
    never exceed VMEM."""
    orig_shape = x.shape
    c = x.shape[-1]
    hid = w1.shape[1]
    xt = x.reshape(-1, c)
    m = xt.shape[0]
    tm, hc = _pick_mlp_blocks(m, c, hid, jnp.dtype(x.dtype).itemsize)
    grid = (m // tm, hid // hc)

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, activation=activation, eps=eps),
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
