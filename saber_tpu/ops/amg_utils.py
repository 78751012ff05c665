"""Batched AMG primitives: box extraction, stability scores, NMS.

TPU-native replacements for the per-mask Python utilities inside the
external SAM2 AutomaticMaskGenerator (reference call site
saber/adapters/sam2/automask.py:66-78). Everything is static-shape and
jittable: masks carry validity flags instead of being filtered out.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def batched_mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """(… ,H,W) bool masks → (… ,4) XYXY boxes; zeros for empty masks."""
    h, w = masks.shape[-2:]
    rows = jnp.any(masks, axis=-1)  # (..., H)
    cols = jnp.any(masks, axis=-2)  # (..., W)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    big = jnp.int32(10**6)
    y0 = jnp.min(jnp.where(rows, ridx, big), axis=-1)
    y1 = jnp.max(jnp.where(rows, ridx, -1), axis=-1)
    x0 = jnp.min(jnp.where(cols, cidx, big), axis=-1)
    x1 = jnp.max(jnp.where(cols, cidx, -1), axis=-1)
    empty = ~jnp.any(rows, axis=-1)
    box = jnp.stack([x0, y0, x1, y1], axis=-1)
    return jnp.where(empty[..., None], 0, box).astype(jnp.float32)


def calculate_stability_score(mask_logits: jnp.ndarray, mask_threshold: float,
                              threshold_offset: float) -> jnp.ndarray:
    """IoU between high/low-threshold binarizations of the logits.

    Matches SAM's stability score: intersections at threshold+offset vs
    threshold-offset, reduced over the last two axes.
    """
    hi = jnp.sum(mask_logits > (mask_threshold + threshold_offset), axis=(-2, -1),
                 dtype=jnp.float32)
    lo = jnp.sum(mask_logits > (mask_threshold - threshold_offset), axis=(-2, -1),
                 dtype=jnp.float32)
    return jnp.where(lo > 0, hi / lo, 1.0)


def bilinear_up_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, align_corners=False.

    Row i holds the two source weights for output sample i under the
    half-pixel-center rule ``u = (i + 0.5) * n_in / n_out - 0.5`` with edge
    clamping — the same convention as ``F.interpolate(mode='bilinear')``.
    """
    xi = jnp.arange(n_out, dtype=jnp.float32)
    u = jnp.clip(xi * (n_in / n_out) + (0.5 * n_in / n_out - 0.5),
                 0.0, n_in - 1.0)
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(u[:, None] - jnp.arange(n_in, dtype=jnp.float32)))


def _phase_counts(m: jnp.ndarray, f: int, t_hi: float, t_lo: float):
    """Threshold counts of the ×f bilinear upscale WITHOUT materializing it.

    Output sample f·i+r interpolates inputs i+⌊u⌋, i+⌊u⌋+1 at fixed
    fractional weight u−⌊u⌋ where u=(r+0.5)/f−0.5 — so the (n, f·S, f·S)
    upscale decomposes into f² phase maps, each a 4-tap blend of shifted
    (n, S, S) views (edge-pad reproduces the clamp exactly; verified vs
    the matrix form to fp32 rounding). Per mask this is ~16·9·S² VPU ops
    instead of two dense (f·S, S) MXU matmuls — ~80× fewer FLOPs, and no
    (n, f·S, f·S) intermediate ever exists.
    """
    n, s_in = m.shape[0], m.shape[1]
    mf = m.astype(jnp.float32)
    mp = jnp.pad(mf, ((0, 0), (1, 1), (1, 1)), mode="edge")
    hi = jnp.zeros((n,), jnp.float32)
    lo = jnp.zeros((n,), jnp.float32)
    taps = []
    for r in range(f):
        u = (r + 0.5) / f - 0.5
        taps.append((int(np.floor(u)), u - np.floor(u)))
    for lo_r, w_r in taps:
        rowmix = ((1.0 - w_r) * mp[:, 1 + lo_r:1 + lo_r + s_in, :]
                  + w_r * mp[:, 2 + lo_r:2 + lo_r + s_in, :])
        for lo_c, w_c in taps:
            phase = ((1.0 - w_c) * rowmix[:, :, 1 + lo_c:1 + lo_c + s_in]
                     + w_c * rowmix[:, :, 2 + lo_c:2 + lo_c + s_in])
            hi += jnp.sum(phase > t_hi, axis=(-2, -1), dtype=jnp.float32)
            lo += jnp.sum(phase > t_lo, axis=(-2, -1), dtype=jnp.float32)
    return hi, lo


def calculate_stability_score_fullres(mask_logits: jnp.ndarray, out_size: int,
                                      mask_threshold: float,
                                      threshold_offset: float,
                                      chunk: int = 32) -> jnp.ndarray:
    """Stability score on the bilinear-upscaled full-resolution logits.

    Torch AMG computes stability AFTER interpolating the 256² decoder
    logits to image resolution (external SAM2AutomaticMaskGenerator
    ``_process_batch``, built at saber/adapters/sam2/automask.py:66-78);
    near the 0.92 gate the low-res and full-res scores can differ by up
    to ~0.2 (tests/test_amg_golden.py pins the delta), so the pipeline
    scores full-res by default. Only the two threshold COUNTS of the
    upscaled map survive: the integer-factor path computes them phase-
    decomposed (``_phase_counts``) with no full-res intermediate; the
    generic path falls back to interpolation matmuls chunked through
    ``lax.map``.
    """
    n, h, w = mask_logits.shape
    t_hi = mask_threshold + threshold_offset
    t_lo = mask_threshold - threshold_offset

    if h == w and out_size % h == 0:
        f = out_size // h
        if f == 1:
            return calculate_stability_score(
                mask_logits, mask_threshold, threshold_offset)
        pad = (-n) % chunk
        padded = jnp.concatenate(
            [mask_logits,
             jnp.full((pad, h, w), -1e4, mask_logits.dtype)], 0) if pad \
            else mask_logits
        hi, lo = jax.lax.map(
            lambda m: _phase_counts(m, f, t_hi, t_lo),
            padded.reshape(-1, chunk, h, w))
        hi, lo = hi.reshape(-1)[:n], lo.reshape(-1)[:n]
        return jnp.where(lo > 0, hi / lo, 1.0)

    a = bilinear_up_matrix(out_size, h)
    pad = (-n) % chunk
    padded = jnp.concatenate(
        [mask_logits,
         jnp.full((pad, h, w), -1e4, mask_logits.dtype)], 0) if pad \
        else mask_logits

    def counts(m):
        up = jnp.einsum("Hh,khw->kHw", a, m.astype(jnp.float32))
        up = jnp.einsum("Ww,kHw->kHW", a, up)
        hi = jnp.sum(up > t_hi, axis=(-2, -1), dtype=jnp.float32)
        lo = jnp.sum(up > t_lo, axis=(-2, -1), dtype=jnp.float32)
        return hi, lo

    hi, lo = jax.lax.map(counts, padded.reshape(-1, chunk, h, w))
    hi, lo = hi.reshape(-1)[:n], lo.reshape(-1)[:n]
    return jnp.where(lo > 0, hi / lo, 1.0)


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N,4) × (M,4) XYXY → (N,M) IoU."""
    area1 = jnp.clip(boxes1[:, 2] - boxes1[:, 0], 0) * jnp.clip(boxes1[:, 3] - boxes1[:, 1], 0)
    area2 = jnp.clip(boxes2[:, 2] - boxes2[:, 0], 0) * jnp.clip(boxes2[:, 3] - boxes2[:, 1], 0)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=())
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                iou_threshold: float) -> jnp.ndarray:
    """On-device greedy NMS with static shapes.

    Iterates over candidates in score order via ``lax.scan`` (N steps, each
    O(N) vector work — fine for AMG's ≤ a few thousand candidates).

    Args:
        boxes: (N,4) XYXY. scores: (N,). valid: (N,) bool.
    Returns:
        (N,) bool keep mask.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    neg_inf = jnp.float32(-jnp.inf)
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores)  # descending

    def step(state, idx):
        keep, suppressed = state
        i = order[idx]
        is_ok = jnp.logical_and(valid[i], jnp.logical_not(suppressed[i]))
        keep = keep.at[i].set(is_ok)
        # Suppress everything overlapping i (only if i was kept).
        over = iou[i] > iou_threshold
        suppressed = jnp.where(jnp.logical_and(is_ok, over), True, suppressed)
        return (keep, suppressed), None

    keep0 = jnp.zeros((n,), bool)
    sup0 = jnp.zeros((n,), bool)
    (keep, _), _ = jax.lax.scan(step, (keep0, sup0), jnp.arange(n))
    return keep


def uncrop_boxes_xyxy(boxes: jnp.ndarray, crop_box) -> jnp.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + jnp.asarray([x0, y0, x0, y0], boxes.dtype)


def uncrop_points(points: jnp.ndarray, crop_box) -> jnp.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return points + jnp.asarray([x0, y0], points.dtype)


def build_point_grid(n_per_side: int) -> jnp.ndarray:
    """Normalized (n², 2) xy grid in [0,1]², SAM-style cell centers."""
    offset = 1.0 / (2 * n_per_side)
    pts = jnp.linspace(offset, 1.0 - offset, n_per_side)
    x = jnp.tile(pts[None, :], (n_per_side, 1))
    y = jnp.tile(pts[:, None], (1, n_per_side))
    return jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
