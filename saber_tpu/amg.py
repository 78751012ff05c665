"""Batched automatic mask generation (AMG) on TPU.

Replaces the external ``SAM2AutomaticMaskGenerator`` +
``FilteredSAM2MaskGenerator`` pair the reference builds in
saber/adapters/sam2/automask.py:49-86 with a static-shape, jit-compiled
pipeline (SURVEY.md §7.3):

- the 32×32 point grid decodes through the mask decoder in fixed-size
  prompt chunks, multimask ×3 candidates per point; candidates gate on
  ``pred_iou_thresh`` and compact into a fixed-capacity top-K ring;
- mask-to-mask (m2m) refinement runs ONCE over the compacted ring after
  the sweep — matching the torch AMG order (iou-filter first, refine the
  survivors, stability-gate the refined masks) instead of refining every
  grid candidate inside the sweep;
- per-crop and cross-crop box NMS run on device
  (saber_tpu/ops/amg_utils.py); the crop hierarchy (``crop_n_layers``)
  batches each layer's crops through the encoder together instead of
  looping crops in Python;
- a single jitted finalize stage does the cross-crop NMS, global top-K
  selection, bilinear upscale + paste into full-resolution canvases
  (expressed as two matmuls per mask so the MXU does the interpolation),
  and bit-packs the final boolean masks — only ~(K, H, W/8) bytes cross
  the host boundary instead of every candidate's low-res logits
  (the round-2 pipeline shipped ~1.1 GB of candidate buffers per image,
  which WAS the 75 s AMG wall clock on the TPU relay).

Output boxes, areas AND stability scores are computed at full resolution
(torch AMG parity): stability upscales the 256² logits with two MXU
matmuls per mask and keeps only the two threshold counts
(ops/amg_utils.py calculate_stability_score_fullres). The cheaper
low-res scoring survives behind ``AMGConfig.stability_fullres=False``;
its deviation (up to ~0.2 near the 0.92 gate on small masks) is
quantified in tests/test_amg_golden.py.

The public surface is ``AutomaticMaskGenerator.generate(image) ->
List[mask dict]`` with the reference's mask-dict schema plus the
relative-box/area filters of FilteredSAM2MaskGenerator (amg.py:139-201).
"""

import math
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from saber_tpu.config import AMGConfig
from saber_tpu.models.sam2 import SAM2
from saber_tpu.ops.amg_utils import (
    batched_mask_to_box,
    batched_nms,
    build_point_grid,
    calculate_stability_score,
    calculate_stability_score_fullres,
)

MASK_THRESHOLD = 0.0
# torch's SAM2ImagePredictor normalizes [0,1] inputs with ImageNet stats
# before the encoder (the reference AMG path inherits this); the video path
# does NOT (saber feeds its own [-3,1] frames) — so normalization lives
# here, not in encode_image.
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_PASTE_CHUNK = 32   # masks pasted per lax.map step in finalize


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float) -> Tuple[List[List[int]], List[int]]:
    """All crop boxes (XYXY) + their layer indices (SAM crop hierarchy)."""
    crop_boxes, layer_idxs = [], []
    h, w = im_size
    crop_boxes.append([0, 0, w, h])
    layer_idxs.append(0)
    short_side = min(h, w)
    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * 2 / n_per_side)
        crop_w = int(math.ceil((overlap * (n_per_side - 1) + w) / n_per_side))
        crop_h = int(math.ceil((overlap * (n_per_side - 1) + h) / n_per_side))
        x0s = [int((crop_w - overlap) * i) for i in range(n_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_per_side)]
        for y0 in y0s:
            for x0 in x0s:
                crop_boxes.append([x0, y0, min(x0 + crop_w, w), min(y0 + crop_h, h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def _topk_merge(buf, new, k):
    """Merge candidate pytrees sorted by (valid, score) desc, keep top k."""
    merged = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), buf, new)
    score = jnp.where(merged["valid"], merged["iou"], -jnp.inf)
    order = jnp.argsort(-score)[:k]
    return jax.tree.map(lambda a: a[order], merged)


def _paste_one(mask_low: jnp.ndarray, crop_param: jnp.ndarray,
               h: int, w: int) -> jnp.ndarray:
    """Bilinear-upscale a (low, low) logit map into an (h, w) canvas.

    crop_param = (x0, y0, cw, ch) floats. Equivalent to
    ``resize(mask, (ch, cw), 'linear')`` pasted at (y0, x0) — expressed as
    two interpolation matmuls so the crop offset/size can be traced values
    (one compiled program covers every crop) and the MXU does the work.
    Pixels outside the crop stay exactly 0.
    """
    low = mask_low.shape[-1]

    def interp_matrix(n_out, x0, extent):
        xi = jnp.arange(n_out, dtype=jnp.float32)
        u = (xi - x0 + 0.5) * (low / extent) - 0.5
        uc = jnp.clip(u, 0.0, low - 1.0)
        wmat = jnp.maximum(
            0.0, 1.0 - jnp.abs(uc[:, None] - jnp.arange(low, dtype=jnp.float32)))
        inside = (xi >= x0) & (xi <= x0 + extent - 1.0)
        return wmat * inside[:, None]

    x0, y0, cw, ch = crop_param[0], crop_param[1], crop_param[2], crop_param[3]
    wy = interp_matrix(h, y0, ch)                      # (h, low)
    wx = interp_matrix(w, x0, cw)                      # (w, low)
    return (wy @ mask_low.astype(jnp.float32)) @ wx.T  # (h, w)


class AutomaticMaskGenerator:
    """Dense point-grid mask generator over a JAX SAM2 model.

    Analog of SAM2AutomaticMaskGenerator + the filtering wrapper
    (reference automask.py:49-86, amg.py:139-201).
    """

    def __init__(self, model: SAM2, params, cfg: Optional[AMGConfig] = None,
                 min_rel_box_size: Optional[float] = None,
                 max_rel_box_size: Optional[float] = None,
                 min_area_filter: Optional[int] = None,
                 max_area_filter: Optional[int] = None,
                 mesh=None):
        self.model = model
        self.params = params
        self.cfg = cfg or AMGConfig()
        self.min_rel_box_size = min_rel_box_size
        self.max_rel_box_size = max_rel_box_size
        self.min_area_filter = min_area_filter
        self.max_area_filter = max_area_filter
        self.mesh = mesh
        self._crop_fn_cache: Dict[Any, Any] = {}
        self._generate_cache: Dict[Any, Any] = {}

    def set_mesh(self, mesh) -> None:
        """Shard the one-program generate over a device mesh: each
        layer's crop batch shards over the ``data`` axis when the crop
        count divides it (the 16-crop layer on 8 devices), and
        single/few-crop layers shard their point-grid decode chunks
        instead (64-point chunks on 8 devices = 8 prompts/device). The
        reference parallelizes AMG only at whole-image granularity
        (saber/utils/parallelization.py:15); this shards WITHIN one
        image for single-image latency. Mesh-captured programs are
        invalidated."""
        self.mesh = mesh
        self._crop_fn_cache.clear()
        self._generate_cache.clear()
        if mesh is not None:
            from saber_tpu.parallel.mesh import replicate
            self.params = replicate(mesh, self.params)

    def _mesh_size(self) -> int:
        import numpy as _np
        return 1 if self.mesh is None else int(_np.prod(self.mesh.devices.shape))

    def _shard(self, x, *spec):
        """with_sharding_constraint when a mesh is set (no-op otherwise)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec)))

    # ------------------------------------------------------------------
    # Device pipeline
    # ------------------------------------------------------------------

    def _stability(self, mask_logits: jnp.ndarray) -> jnp.ndarray:
        """Stability scores with torch AMG semantics (full-res upscale)
        by default; ``cfg.stability_fullres=False`` keeps the cheaper
        low-res scoring (deviation quantified in tests/test_amg_golden.py)."""
        cfg = self.cfg
        if cfg.stability_fullres:
            return calculate_stability_score_fullres(
                mask_logits, self.model.config.image_size,
                MASK_THRESHOLD, cfg.stability_score_offset)
        return calculate_stability_score(
            mask_logits, MASK_THRESHOLD, cfg.stability_score_offset)

    def _decode_chunk(self, params, backbone_b, points):
        """First-pass decode: points (P, 2) → P·k multimask candidates.

        Candidates gate on ``pred_iou_thresh`` only (torch AMG m2m order:
        the stability gate applies AFTER refinement); when m2m is off the
        stability gate applies here.
        """
        cfg = self.cfg
        p = points.shape[0]
        pts = jnp.concatenate([points[:, None, :], jnp.zeros((p, 1, 2))], axis=1)
        lbl = jnp.concatenate(
            [jnp.ones((p, 1), jnp.int32), -jnp.ones((p, 1), jnp.int32)], axis=1)
        masks, iou, _, _ = self.model.apply(
            {"params": params}, backbone_b, pts, lbl,
            multimask_output=cfg.multimask_output, method=SAM2.decode)
        k = masks.shape[1]
        flat_masks = masks.reshape(p * k, *masks.shape[2:])
        flat_iou = iou.reshape(p * k)
        flat_points = jnp.repeat(points, k, axis=0)

        valid = flat_iou > cfg.pred_iou_thresh
        if cfg.use_m2m:
            stability = jnp.zeros_like(flat_iou)  # filled post-refine
        else:
            stability = self._stability(flat_masks)
            valid &= stability >= cfg.stability_score_thresh
            valid &= jnp.any(flat_masks > MASK_THRESHOLD, axis=(-2, -1))
        return {
            "masks": flat_masks, "iou": flat_iou, "stability": stability,
            "points": flat_points, "valid": valid,
        }

    def _refine_ring(self, params, backbone_b, buf, chunk: int):
        """m2m: re-decode the ring's survivors with their own logits as a
        dense prompt (torch AMG refine_with_m2m). One chunked pass over
        the ≤cap compacted candidates instead of ×3 every grid decode.

        torch semantics: the iou gate already applied uses FIRST-pass
        predictions; refined iou replaces the score (for ranking/NMS) and
        the stability gate applies to the refined masks.
        """
        cfg = self.cfg
        cap = buf["iou"].shape[0]
        rcap = ((cap + chunk - 1) // chunk) * chunk
        pad = rcap - cap

        def padded(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], 0) if pad else a

        pts_all = padded(buf["points"]).reshape(rcap // chunk, chunk, 2)
        masks_all = padded(buf["masks"]).reshape(
            rcap // chunk, chunk, *buf["masks"].shape[1:])

        def step(_, inp):
            pts, mlow = inp
            p = pts.shape[0]
            pts_r = jnp.concatenate([pts[:, None, :], jnp.zeros((p, 1, 2))], axis=1)
            lbl_r = jnp.concatenate(
                [jnp.ones((p, 1), jnp.int32), -jnp.ones((p, 1), jnp.int32)], axis=1)
            masks_r, iou_r, _, _ = self.model.apply(
                {"params": params}, backbone_b, pts_r, lbl_r,
                mlow[..., None], multimask_output=False,
                dynamic_multimask=False, method=SAM2.decode)
            return None, (masks_r[:, 0], iou_r[:, 0])

        _, (masks_r, iou_r) = jax.lax.scan(step, None, (pts_all, masks_all))
        masks_r = masks_r.reshape(rcap, *masks_r.shape[2:])[:cap]
        iou_r = iou_r.reshape(rcap)[:cap]

        stability = self._stability(masks_r)
        valid = buf["valid"] & (stability >= cfg.stability_score_thresh)
        valid &= jnp.any(masks_r > MASK_THRESHOLD, axis=(-2, -1))
        return {"masks": masks_r, "iou": iou_r, "stability": stability,
                "points": buf["points"], "valid": valid}

    def _build_layer_fn(self, n_points_side: int, chunk: int, n_crops: int):
        """jit-compiled grid sweep for every crop of one layer at once.

        The torch AMG loops crops in Python (one generate() per crop,
        reference automask.py wraps SAM2AutomaticMaskGenerator); here the
        crop axis is vmapped so all 4/16 same-size crops of a layer sweep
        their grids in a single device program.
        """
        cfg = self.cfg
        model_size = self.model.config.image_size
        k_mult = 3 if cfg.multimask_output else 1
        cap = min(cfg.max_masks, n_points_side**2 * k_mult)
        lowres = model_size // 4

        def run_one(params, backbone, chunks, chunk_valid):
            # backbone leaves arrive WITHOUT a batch axis (vmapped out);
            # chunks/chunk_valid are shared across crops (in_axes=None)
            # so ``gen`` can shard the prompt axis outside the vmap
            # batch-1 image features: the decoder broadcasts them against
            # the prompt batch lazily at the skip-connection adds, instead
            # of materializing (chunk, 256, 256, 256) fpn copies
            backbone_b = jax.tree.map(
                lambda x: x[None] if x.ndim == 3 else x, backbone)

            init = {
                "masks": jnp.full((cap, lowres, lowres), -1e4, jnp.float32),
                "iou": jnp.zeros((cap,), jnp.float32),
                "stability": jnp.zeros((cap,), jnp.float32),
                "points": jnp.zeros((cap, 2), jnp.float32),
                "valid": jnp.zeros((cap,), bool),
            }

            def step(buf, inp):
                pts, pvalid = inp
                out = self._decode_chunk(params, backbone_b, pts)
                out["valid"] &= jnp.repeat(pvalid, k_mult)
                return _topk_merge(buf, out, cap), None

            buf, _ = jax.lax.scan(step, init, (chunks, chunk_valid))

            if cfg.use_m2m:
                buf = self._refine_ring(params, backbone_b, buf, chunk)

            # per-crop NMS on low-res boxes. Box IoU is invariant to the
            # uniform per-crop scale, so NMS here ≡ torch's NMS on
            # crop-resolution boxes.
            boxes = batched_mask_to_box(buf["masks"] > MASK_THRESHOLD)
            keep = batched_nms(boxes, buf["iou"], buf["valid"],
                               cfg.box_nms_thresh)
            buf["valid"] &= keep
            buf["boxes"] = boxes
            return buf

        return jax.vmap(run_one, in_axes=(None, 0, None, None))

    def _grid_chunks(self, n_points_side: int, chunk: int):
        """Static (n_chunks, chunk, 2) point grid + validity for a layer
        (pixel xy at model scale, padded with -1 sentinels)."""
        model_size = self.model.config.image_size
        grid = build_point_grid(n_points_side) * model_size    # (G², 2)
        g2 = grid.shape[0]
        pad = (-g2) % chunk
        grid_p = jnp.concatenate(
            [grid, jnp.full((pad, 2), -1.0)], axis=0) if pad else grid
        pad_mask = jnp.concatenate(
            [jnp.ones((g2,), bool), jnp.zeros((pad,), bool)]) if pad \
            else jnp.ones((g2,), bool)
        return grid_p.reshape(-1, chunk, 2), pad_mask.reshape(-1, chunk)

    def _layer_chunk(self, n_points_side: int, n_crops: int) -> int:
        per_crop = min(self.cfg.points_per_batch, n_points_side**2)
        if n_crops > 1:
            per_crop = max(1, min(per_crop,
                                  self.cfg.step_prompt_budget // n_crops))
        return per_crop

    def _layer_fn(self, n_points_side: int, per_crop: int, n_crops: int):
        key = (n_points_side, per_crop, n_crops)
        if key not in self._crop_fn_cache:
            self._crop_fn_cache[key] = self._build_layer_fn(
                n_points_side, per_crop, n_crops)
        return self._crop_fn_cache[key]

    # ------------------------------------------------------------------
    # Finalize: cross-crop NMS + top-K + paste, all one device program
    # ------------------------------------------------------------------

    def _build_finalize_fn(self, layer_shapes, h: int, w: int, k_out: int,
                           multi_crop: bool):
        """layer_shapes: tuple of (n_crops, cap) per layer."""
        cfg = self.cfg
        model_size = self.model.config.image_size
        lowres = model_size // 4

        def finalize(bufs, crop_params):
            ious, stabs, valids, boxes_i, pts_i, careas = [], [], [], [], [], []
            for buf, cp, (c, cap) in zip(bufs, crop_params, layer_shapes):
                x0, y0 = cp[:, 0:1], cp[:, 1:2]                # (C,1)
                cw, ch = cp[:, 2:3], cp[:, 3:4]
                sx, sy = cw / lowres, ch / lowres
                scale = jnp.concatenate([sx, sy, sx, sy], 1)[:, None, :]
                shift = jnp.concatenate([x0, y0, x0, y0], 1)[:, None, :]
                bimg = buf["boxes"] * scale + shift            # (C, cap, 4)
                # torch AMG is_box_near_crop_edge (atol=20): drop candidates
                # truncated at an interior crop boundary — they would
                # otherwise survive NMS with the 1/crop_area score
                # preferring small crops.
                crop_arr = jnp.concatenate([x0, y0, x0 + cw, y0 + ch], 1)[:, None, :]
                orig_arr = jnp.asarray([0.0, 0.0, w, h])[None, None, :]
                near_crop = jnp.abs(bimg - crop_arr) <= 20.0
                near_img = jnp.abs(bimg - orig_arr) <= 20.0
                inner = ~jnp.any(near_crop & ~near_img, axis=-1)
                pts = (buf["points"]
                       * jnp.concatenate([cw, ch], 1)[:, None, :] / model_size
                       + jnp.concatenate([x0, y0], 1)[:, None, :])
                ious.append(buf["iou"].reshape(-1))
                stabs.append(buf["stability"].reshape(-1))
                valids.append((buf["valid"] & inner).reshape(-1))
                boxes_i.append(bimg.reshape(-1, 4))
                pts_i.append(pts.reshape(-1, 2))
                careas.append(jnp.broadcast_to(cw * ch, (c, cap)).reshape(-1))

            iou = jnp.concatenate(ious)
            stab = jnp.concatenate(stabs)
            valid = jnp.concatenate(valids)
            boxes = jnp.concatenate(boxes_i)
            pts = jnp.concatenate(pts_i)
            careas_all = jnp.concatenate(careas)

            if multi_crop:
                # cross-crop dedup preferring smaller crops (torch AMG)
                keep = batched_nms(boxes, 1.0 / careas_all, valid,
                                   cfg.box_nms_thresh)
                valid &= keep

            score = jnp.where(valid, iou, -jnp.inf)
            sel = jnp.argsort(-score)[:k_out]                  # (K,)
            sel_valid = valid[sel]

            # gather selected low-res masks + crop params layer by layer
            masks_sel = jnp.zeros((k_out, lowres, lowres), jnp.float32)
            cp_sel = jnp.zeros((k_out, 4), jnp.float32)
            crop_id = jnp.zeros((k_out,), jnp.int32)
            off = 0
            crop_off = 0
            for buf, cp, (c, cap) in zip(bufs, crop_params, layer_shapes):
                n_l = c * cap
                local = jnp.clip(sel - off, 0, n_l - 1)
                in_l = (sel >= off) & (sel < off + n_l)
                g = buf["masks"].reshape(n_l, lowres, lowres)[local]
                masks_sel = jnp.where(in_l[:, None, None], g, masks_sel)
                cidx = local // cap                            # (K,) in [0,C)
                cp_g = cp[:, :4][cidx]
                cp_sel = jnp.where(in_l[:, None], cp_g, cp_sel)
                crop_id = jnp.where(in_l, cidx + crop_off, crop_id)
                off += n_l
                crop_off += c

            # paste chunks: upscale + place, threshold, box/area, packbits
            k_pad = ((k_out + _PASTE_CHUNK - 1) // _PASTE_CHUNK) * _PASTE_CHUNK
            pad = k_pad - k_out

            def padk(a):
                return jnp.concatenate(
                    [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], 0) if pad else a

            m_p = padk(masks_sel).reshape(-1, _PASTE_CHUNK, lowres, lowres)
            cp_p = padk(cp_sel).reshape(-1, _PASTE_CHUNK, 4)
            v_p = padk(sel_valid).reshape(-1, _PASTE_CHUNK)

            def paste_chunk(inp):
                m, cp, v = inp
                logits = jax.vmap(_paste_one, in_axes=(0, 0, None, None))(
                    m, cp, h, w)
                seg = (logits > MASK_THRESHOLD) & v[:, None, None]
                bx = batched_mask_to_box(seg)
                area = jnp.sum(seg, axis=(1, 2), dtype=jnp.int32)
                packed = jnp.packbits(seg, axis=-1)
                return packed, bx, area

            packed, bx, area = jax.lax.map(paste_chunk, (m_p, cp_p, v_p))
            packed = packed.reshape(k_pad, h, -1)[:k_out]
            bx = bx.reshape(k_pad, 4)[:k_out]
            area = area.reshape(k_pad)[:k_out]
            sel_valid &= area > 0
            return {
                "packed": packed, "boxes": bx, "area": area,
                "iou": iou[sel], "stability": stab[sel],
                "points": pts[sel], "crop_id": crop_id, "valid": sel_valid,
            }

        return finalize

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------

    def _build_generate_fn(self, h: int, w: int, layer_plan):
        """ONE jitted program for the whole generate: per layer, crop +
        resize + normalize (static crop boxes baked in) → encoder → grid
        sweep; then the cross-crop finalize — a single device dispatch
        per image geometry.

        The torch AMG re-runs set_image + a Python point loop per crop
        (21 encoder calls and 21 decode sweeps at crop_n_layers=2); the
        round-2 pipeline here used ~10 separate programs per image, and
        on a remote-TPU link every program's first call costs ~45-60 s of
        load/compile-helper overhead per process — program COUNT, not
        math, dominated the AMG wall clock.

        layer_plan: tuple of (boxes, n_side, per_crop) per layer, boxes a
        tuple of static (x0, y0, x1, y1) crops.
        """
        cfg = self.cfg
        model_size = self.model.config.image_size
        mcls = type(self.model)
        k_mult = 3 if cfg.multimask_output else 1
        layer_shapes = tuple(
            (len(boxes), min(cfg.max_masks, n_side**2 * k_mult))
            for boxes, n_side, _ in layer_plan)
        n_tot = sum(c * cap for c, cap in layer_shapes)
        k_out = min(cfg.max_masks, n_tot)
        multi_crop = sum(len(b) for b, _, _ in layer_plan) > 1
        finalize = self._build_finalize_fn(layer_shapes, h, w, k_out,
                                           multi_crop)
        mean = jnp.asarray(_IMAGENET_MEAN)
        std = jnp.asarray(_IMAGENET_STD)

        # a layer shards over the mesh's `data` axis on whichever batch
        # dimension divides it: the crop batch when it can (the 16-crop
        # layer on ≤16 devices), else the point-grid prompt chunks
        # (single-crop layers: 64-point chunks = 8 prompts/device on 8
        # chips). GSPMD propagates the input constraint through the
        # encoder / the decode scan. ``last_shard_modes`` records the
        # per-layer decision for tests and the driver dryrun.
        n_dev = self._mesh_size()
        shard_modes = tuple(
            "crop" if (n_dev > 1 and len(boxes) % n_dev == 0) else
            "chunk" if (n_dev > 1 and per_crop % n_dev == 0) else None
            for boxes, _, per_crop in layer_plan)
        self.last_shard_modes = shard_modes

        def gen(params, img):
            bufs, crop_params = [], []
            for (boxes, n_side, per_crop), mode in zip(layer_plan,
                                                       shard_modes):
                crop_shard = mode == "crop"
                chunk_shard = mode == "chunk"
                resized = jnp.stack([
                    jax.image.resize(img[c[1]:c[3], c[0]:c[2]],
                                     (model_size, model_size, 3),
                                     method="bilinear")
                    for c in boxes])
                resized = (resized - mean) / std
                if crop_shard:
                    resized = self._shard(resized, "data")
                # encode_video_frames = encode_image + the decoder's
                # conv_s0/s1 skip projections, applied ONCE per crop —
                # the grid sweep's scan body would otherwise re-project
                # the 256-channel maps every prompt chunk
                bb = self.model.apply({"params": params}, resized,
                                      method=mcls.encode_video_frames)
                decode_bb = {"vision_features": bb["vision_features"],
                             "backbone_fpn": list(bb["backbone_fpn"])}
                if crop_shard:
                    decode_bb = jax.tree.map(
                        lambda x: self._shard(x, "data"), decode_bb)
                chunks, chunk_valid = self._grid_chunks(n_side, per_crop)
                if chunk_shard:
                    chunks = self._shard(chunks, None, "data")
                    chunk_valid = self._shard(chunk_valid, None, "data")
                buf = self._layer_fn(n_side, per_crop, len(boxes))(
                    params, decode_bb, chunks, chunk_valid)
                bufs.append(buf)
                crop_params.append(jnp.asarray(
                    [[c[0], c[1], c[2] - c[0], c[3] - c[1]] for c in boxes],
                    jnp.float32))
            return finalize(bufs, crop_params)

        return jax.jit(gen), k_out

    def _make_plan(self, h: int, w: int):
        """Static per-layer crop/grid plan for an (h, w) image.

        Returns (layer_plan, crop_boxes, crop_order): layer_plan is the
        tuple consumed by ``_build_generate_fn``; crop_order maps the
        finalize's flat crop_id back into ``crop_boxes``.
        """
        cfg = self.cfg
        crop_boxes, layer_idxs = generate_crop_boxes(
            (h, w), cfg.crop_n_layers, cfg.crop_overlap_ratio)
        by_layer: Dict[int, List[int]] = {}
        for ci, layer in enumerate(layer_idxs):
            by_layer.setdefault(layer, []).append(ci)

        layer_plan = []
        crop_order: List[int] = []                  # finalize crop_id → box
        for layer, cids in sorted(by_layer.items()):
            n_side = max(1, cfg.npoints
                         // (cfg.crop_n_points_downscale_factor ** layer))
            layer_plan.append((
                tuple(tuple(crop_boxes[i]) for i in cids), n_side,
                self._layer_chunk(n_side, len(cids))))
            crop_order.extend(cids)
        return tuple(layer_plan), crop_boxes, crop_order

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image: (H, W, 3) float in [0,1] (reference prepare() output).

        Returns the reference mask-dict list sorted by predicted IoU.
        """
        cfg = self.cfg
        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=2)
        h, w = image.shape[:2]
        layer_plan, crop_boxes, crop_order = self._make_plan(h, w)

        gkey = (h, w, layer_plan, cfg.max_masks, cfg.stability_fullres,
                cfg.use_m2m, cfg.pred_iou_thresh, cfg.stability_score_thresh,
                cfg.stability_score_offset, cfg.box_nms_thresh,
                cfg.multimask_output)
        if gkey not in self._generate_cache:
            self._generate_cache[gkey] = self._build_generate_fn(
                h, w, layer_plan)
        gen_fn, k_out = self._generate_cache[gkey]

        img_dev = jnp.asarray(image, jnp.float32)   # one upload
        res = jax.tree.map(np.asarray, gen_fn(self.params, img_dev))

        out: List[Dict[str, Any]] = []
        for j in range(k_out):
            if not res["valid"][j]:
                continue
            bx = res["boxes"][j]
            out.append({
                "segmentation": None,       # unpacked after the filters
                "_packed": res["packed"][j],
                "area": int(res["area"][j]),
                "bbox": [float(bx[0]), float(bx[1]),
                         float(bx[2] - bx[0]), float(bx[3] - bx[1])],
                "predicted_iou": float(res["iou"][j]),
                "point_coords": [res["points"][j].tolist()],
                "stability_score": float(res["stability"][j]),
                "crop_box": [float(v) for v in
                             crop_boxes[crop_order[int(res["crop_id"][j])]]],
            })

        # the filters read only bbox/area, so unpack the full-res bitmask
        # ONLY for survivors: at K=256 the unpackbits of every candidate
        # (256 MB of boolean writes) dominated generate() wall clock on
        # slow hosts — the device math is ~2 s (tools/bench_amg_breakdown.py)
        out = self._apply_filters(out, h, w)
        for m in out:
            m["segmentation"] = np.unpackbits(
                m.pop("_packed"), axis=-1, count=w).astype(bool)
        out.sort(key=lambda m: m["predicted_iou"], reverse=True)
        return out

    def _apply_filters(self, masks, h, w):
        """Relative-box-size and area filters (reference amg.py:139-201)."""
        res = masks
        if self.max_rel_box_size is not None or self.min_rel_box_size is not None:
            kept = []
            for m in res:
                _, _, bw, bh = m["bbox"]
                rw, rh = bw / w, bh / h
                ok = True
                if self.max_rel_box_size is not None:
                    ok = ok and rw < self.max_rel_box_size and rh < self.max_rel_box_size
                if self.min_rel_box_size is not None:
                    ok = ok and rw > self.min_rel_box_size and rh > self.min_rel_box_size
                if ok:
                    kept.append(m)
            res = kept
        if self.min_area_filter is not None or self.max_area_filter is not None:
            kept = []
            for m in res:
                ok = True
                if self.min_area_filter is not None:
                    ok = ok and m["area"] >= self.min_area_filter
                if self.max_area_filter is not None:
                    ok = ok and m["area"] <= self.max_area_filter
                if ok:
                    kept.append(m)
            res = kept
        return res

    def set_filters(self, min_rel_box_size=None, max_rel_box_size=None,
                    min_area_filter=None):
        """Update filter parameters (reference amg.py:185-197)."""
        if min_rel_box_size is not None:
            self.min_rel_box_size = min_rel_box_size
        if max_rel_box_size is not None:
            self.max_rel_box_size = max_rel_box_size
        if min_area_filter is not None:
            self.min_area_filter = min_area_filter


def build_amg(model: SAM2, params, amg_cfg: Optional[AMGConfig] = None,
              min_rel_box_size: Optional[float] = None,
              max_rel_box_size: Optional[float] = None,
              min_area_filter: Optional[int] = None,
              mesh=None) -> AutomaticMaskGenerator:
    """Construct the point-grid generator (reference automask.py:49-86)."""
    return AutomaticMaskGenerator(
        model, params, amg_cfg,
        min_rel_box_size=min_rel_box_size, max_rel_box_size=max_rel_box_size,
        min_area_filter=min_area_filter, mesh=mesh)
