"""Batched automatic mask generation (AMG) on TPU.

Replaces the external ``SAM2AutomaticMaskGenerator`` +
``FilteredSAM2MaskGenerator`` pair the reference builds in
saber/adapters/sam2/automask.py:49-86 with a static-shape, jit-compiled
pipeline (SURVEY.md §7.3):

- the 32×32 point grid decodes through the mask decoder in fixed-size
  prompt chunks (``points_per_batch``), multimask ×3 candidates per point;
- optional mask-to-mask (m2m) refinement is a second single-mask decode
  with the first pass's logits as dense prompt;
- IoU / stability filters are vectorized; surviving candidates compact
  into a fixed-capacity top-K ring via a scan (no dynamic shapes);
- per-crop and cross-crop box NMS run on device
  (saber_tpu/ops/amg_utils.py); the crop hierarchy
  (``crop_n_layers``) batches each layer's crops through the encoder
  together instead of looping crops in Python.

Differences vs torch (documented tolerance): stability scores and boxes
are computed on the 256² low-res logits rather than the upscaled
full-res masks (identical up to interpolation at the 0-threshold).

The public surface is ``AutomaticMaskGenerator.generate(image) ->
List[mask dict]`` with the reference's mask-dict schema plus the
relative-box/area filters of FilteredSAM2MaskGenerator (amg.py:139-201).
"""

import math
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
)

MASK_THRESHOLD = 0.0
# torch's SAM2ImagePredictor normalizes [0,1] inputs with ImageNet stats
# before the encoder (the reference AMG path inherits this); the video path
# does NOT (saber feeds its own [-3,1] frames) — so normalization lives
# here, not in encode_image.
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


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


class AutomaticMaskGenerator:
    """Dense point-grid mask generator over a JAX SAM2 model.

    Analog of SAM2AutomaticMaskGenerator + the filtering wrapper
    (reference automask.py:49-86, amg.py:139-201).
    """

    def __init__(self, model: SAM2, params, cfg: Optional[AMGConfig] = None,
                 min_rel_box_size: Optional[float] = None,
                 max_rel_box_size: Optional[float] = None,
                 min_area_filter: Optional[int] = None,
                 max_area_filter: Optional[int] = None):
        self.model = model
        self.params = params
        self.cfg = cfg or AMGConfig()
        self.min_rel_box_size = min_rel_box_size
        self.max_rel_box_size = max_rel_box_size
        self.min_area_filter = min_area_filter
        self.max_area_filter = max_area_filter
        self._crop_fn_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # Device pipeline
    # ------------------------------------------------------------------

    def _decode_chunk(self, params, backbone_b, points):
        """points: (P, 2) model-frame pixels → (3P or P) candidates."""
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

        if cfg.use_m2m:
            # refine every candidate with a single-mask pass conditioned on
            # the first-pass logits (torch AMG refine_with_m2m).
            pts_r = jnp.concatenate(
                [flat_points[:, None, :], jnp.zeros((p * k, 1, 2))], axis=1)
            lbl_r = jnp.concatenate(
                [jnp.ones((p * k, 1), jnp.int32), -jnp.ones((p * k, 1), jnp.int32)],
                axis=1)
            # backbone_b stays batch-1; the p·k-prompt refine pass
            # broadcasts against it inside the decoder
            masks_r, iou_r, _, _ = self.model.apply(
                {"params": params}, backbone_b, pts_r, lbl_r,
                flat_masks[..., None], multimask_output=False,
                dynamic_multimask=False, method=SAM2.decode)
            flat_masks = masks_r[:, 0]
            flat_iou = iou_r[:, 0]

        stability = calculate_stability_score(
            flat_masks, MASK_THRESHOLD, cfg.stability_score_offset)
        valid = (flat_iou > cfg.pred_iou_thresh) & (stability >= cfg.stability_score_thresh)
        # empty masks can sneak through; drop them
        valid &= jnp.any(flat_masks > MASK_THRESHOLD, axis=(-2, -1))
        return {
            "masks": flat_masks, "iou": flat_iou, "stability": stability,
            "points": flat_points, "valid": valid,
        }

    # Per-scan-step prompt budget when a layer's crops are batched: crops
    # fold into the prompt batch, so each crop's chunk shrinks to keep the
    # live decode tensors bounded while the MXU still sees a full batch.
    STEP_PROMPT_BUDGET = 256

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

        def run_one(params, backbone):
            # backbone leaves arrive WITHOUT a batch axis (vmapped out)
            grid = build_point_grid(n_points_side) * model_size  # (G²,2) xy px
            g2 = grid.shape[0]
            pad = (-g2) % chunk
            grid_p = jnp.concatenate(
                [grid, jnp.full((pad, 2), -1.0)], axis=0) if pad else grid
            pad_mask = jnp.concatenate(
                [jnp.ones((g2,), bool), jnp.zeros((pad,), bool)]) if pad \
                else jnp.ones((g2,), bool)
            chunks = grid_p.reshape(-1, chunk, 2)
            chunk_valid = pad_mask.reshape(-1, chunk)

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

            # per-crop NMS on low-res boxes (scaled up at the host boundary)
            boxes = batched_mask_to_box(buf["masks"] > MASK_THRESHOLD)
            keep = batched_nms(boxes, buf["iou"], buf["valid"],
                               cfg.box_nms_thresh)
            buf["valid"] &= keep
            buf["boxes"] = boxes
            return buf

        return jax.jit(jax.vmap(run_one, in_axes=(None, 0)))

    def _run_layer(self, backbone, n_points_side: int, n_crops: int):
        """backbone: pytree with leading crop axis n_crops. Returns a
        candidate buffer pytree with leading axis n_crops."""
        per_crop = min(self.cfg.points_per_batch, n_points_side**2)
        if n_crops > 1:
            per_crop = max(1, min(per_crop,
                                  -(-self.STEP_PROMPT_BUDGET // n_crops)))
        key = (n_points_side, per_crop, n_crops)
        if key not in self._crop_fn_cache:
            self._crop_fn_cache[key] = self._build_layer_fn(
                n_points_side, per_crop, n_crops)
        # only the decode inputs carry the crop batch axis; pos encodings
        # are unbatched and unused by the decoder
        decode_bb = {"vision_features": backbone["vision_features"],
                     "backbone_fpn": list(backbone["backbone_fpn"])}
        return self._crop_fn_cache[key](self.params, decode_bb)

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------

    def _encode(self, images: np.ndarray):
        """images: (B, S, S, 3) resized crops → backbone pytree."""
        return self.model.apply({"params": self.params},
                                jnp.asarray(images), method=SAM2.encode_image)

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image: (H, W, 3) float in [0,1] (reference prepare() output).

        Returns the reference mask-dict list sorted by predicted IoU.
        """
        cfg = self.cfg
        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=2)
        h, w = image.shape[:2]
        model_size = self.model.config.image_size
        lowres = model_size // 4

        crop_boxes, layer_idxs = generate_crop_boxes(
            (h, w), cfg.crop_n_layers, cfg.crop_overlap_ratio)

        # one encoder batch AND one grid-sweep program per layer (the torch
        # AMG re-runs set_image + a Python point loop per crop — 21 encoder
        # calls and 21 decode sweeps at crop_n_layers=2)
        by_layer: Dict[int, List[int]] = {}
        for ci, layer in enumerate(layer_idxs):
            by_layer.setdefault(layer, []).append(ci)

        img_dev = jnp.asarray(image, jnp.float32)   # one upload, reused
        all_data: List[Dict[str, np.ndarray]] = []
        for layer, cids in sorted(by_layer.items()):
            # crop + resize + normalize stay ON DEVICE: the previous
            # np.asarray round trip per crop cost 21 blocking transfers
            # (~0.5 GB) per image on the TPU relay — ~65 of the 75 s AMG
            # wall clock
            resized = jnp.stack([
                jax.image.resize(img_dev[c[1]:c[3], c[0]:c[2]],
                                 (model_size, model_size, 3),
                                 method="bilinear")
                for c in (crop_boxes[i] for i in cids)])
            resized = ((resized - jnp.asarray(_IMAGENET_MEAN))
                       / jnp.asarray(_IMAGENET_STD))
            bb = self._encode(resized)
            n_side = max(1, cfg.npoints
                         // (cfg.crop_n_points_downscale_factor ** layer))
            layer_buf = jax.tree.map(
                np.asarray, self._run_layer(bb, n_side, len(cids)))

            for k, ci in enumerate(cids):
                buf = jax.tree.map(lambda a, k=k: a[k], layer_buf)
                crop_box = crop_boxes[ci]
                x0, y0, x1, y1 = crop_box
                ch, cw = y1 - y0, x1 - x0

                keep = buf["valid"]
                if not keep.any():
                    continue
                idx = np.nonzero(keep)[0]
                # scale low-res boxes/points back to image frame
                sx, sy = cw / lowres, ch / lowres
                boxes = buf["boxes"][idx] * np.array([sx, sy, sx, sy], np.float32)
                boxes += np.array([x0, y0, x0, y0], np.float32)
                # torch AMG is_box_near_crop_edge (atol=20): drop candidates
                # truncated at an interior crop boundary — they would
                # otherwise survive NMS with the 1/crop_area score
                # preferring small crops.
                crop_arr = np.array([x0, y0, x1, y1], np.float32)
                orig_arr = np.array([0, 0, w, h], np.float32)
                near_crop = np.abs(boxes - crop_arr) <= 20.0
                near_img = np.abs(boxes - orig_arr) <= 20.0
                inner = ~np.any(near_crop & ~near_img, axis=1)
                if not inner.any():
                    continue
                idx, boxes = idx[inner], boxes[inner]
                pts = buf["points"][idx] * np.array(
                    [cw / model_size, ch / model_size], np.float32)
                pts += np.array([x0, y0], np.float32)
                all_data.append({
                    "masks_lowres": buf["masks"][idx],
                    "iou": buf["iou"][idx],
                    "stability": buf["stability"][idx],
                    "boxes": boxes,
                    "points": pts,
                    "crop_box": np.array(crop_box, np.float32),
                    "crop_hw": (ch, cw),
                })

        if not all_data:
            return []

        # cross-crop NMS preferring smaller crops (torch AMG semantics)
        boxes = np.concatenate([d["boxes"] for d in all_data])
        crop_areas = np.concatenate([
            np.full(len(d["iou"]),
                    (d["crop_box"][2] - d["crop_box"][0])
                    * (d["crop_box"][3] - d["crop_box"][1]))
            for d in all_data])
        if len(all_data) > 1:
            scores = 1.0 / crop_areas
            keep = np.asarray(batched_nms(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.ones((len(boxes),), bool), cfg.box_nms_thresh))
        else:
            keep = np.ones(len(boxes), bool)

        # rasterize kept masks into full-res canvases
        out: List[Dict[str, Any]] = []
        offset = 0
        for d in all_data:
            n = len(d["iou"])
            kept = np.nonzero(keep[offset:offset + n])[0]
            offset += n
            if kept.size == 0:
                continue
            ch, cw = d["crop_hw"]
            x0, y0 = int(d["crop_box"][0]), int(d["crop_box"][1])
            up = np.asarray(jax.image.resize(
                jnp.asarray(d["masks_lowres"][kept]),
                (kept.size, ch, cw), method="bilinear"))
            # one batched paste for all kept masks of the crop (was a
            # per-mask Python loop with a fresh full canvas each)
            segs = np.zeros((kept.size, h, w), bool)
            segs[:, y0:y0 + ch, x0:x0 + cw] = up > MASK_THRESHOLD
            areas = segs.sum(axis=(1, 2))
            for j, i in enumerate(kept):
                if areas[j] == 0:
                    continue
                bx = d["boxes"][i]
                out.append({
                    "segmentation": segs[j],
                    "area": int(areas[j]),
                    "bbox": [float(bx[0]), float(bx[1]),
                             float(bx[2] - bx[0]), float(bx[3] - bx[1])],
                    "predicted_iou": float(d["iou"][i]),
                    "point_coords": [d["points"][i].tolist()],
                    "stability_score": float(d["stability"][i]),
                    "crop_box": d["crop_box"].tolist(),
                })

        out = self._apply_filters(out, h, w)
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
              min_area_filter: Optional[int] = None) -> AutomaticMaskGenerator:
    """Construct the point-grid generator (reference automask.py:49-86)."""
    return AutomaticMaskGenerator(
        model, params, amg_cfg,
        min_rel_box_size=min_rel_box_size, max_rel_box_size=max_rel_box_size,
        min_area_filter=min_area_filter)
