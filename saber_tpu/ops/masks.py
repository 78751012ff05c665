"""Label-map algebra and mask post-processing.

TPU-native port of reference saber/filters/masks.py and the duplicate
removal in saber/segmenters/utils.py:5-86. Public mask-dict schema is
preserved (``{'segmentation', 'area', 'bbox', 'predicted_iou',
'point_coords', 'stability_score', 'crop_box'}``); the expensive inner math
(IoU matrices, consensus accumulation, per-label Gaussian feathering) runs
batched on device.

Reference quirks fixed (SURVEY.md §6b): ``masks_to_array`` empty-list
handling, deprecated ``np.bool`` aliases.
"""

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from saber_tpu.ops.connected import label as cc_label


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------

@jax.jit
def mask_iou_matrix(masks: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of N binary masks via one MXU matmul.

    Args:
        masks: (N, H, W) bool/0-1.
    Returns:
        (N, N) float32 IoU matrix.

    Replaces the reference's O(N²) Python loop of per-pair
    ``np.logical_and`` (segmenters/utils.py:23-30).
    """
    flat = masks.reshape(masks.shape[0], -1).astype(jnp.float32)
    inter = flat @ flat.T
    areas = flat.sum(axis=1)
    union = areas[:, None] + areas[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@jax.jit
def _consensus_maps(masks: jnp.ndarray, confidences: jnp.ndarray):
    """Confidence-weighted accumulation (reference masks.py:64-87)."""
    m = masks.astype(jnp.float32)
    confidence_map = jnp.einsum("nhw,n->hw", m, confidences.astype(jnp.float32))
    overlap = m.sum(axis=0)
    avg_conf = jnp.where(overlap > 0, confidence_map / jnp.maximum(overlap, 1), 0.0)
    return overlap > 0, avg_conf


# ---------------------------------------------------------------------------
# Public mask algebra (host API, device math)
# ---------------------------------------------------------------------------

def remove_duplicate_masks(masks: List[Dict[str, Any]],
                           iou_threshold: float = 0.9,
                           area_threshold: float = 0.9,
                           verbose: bool = False) -> List[Dict[str, Any]]:
    """Deduplicate mask dicts; keep highest stability_score per duplicate group.

    Same grouping semantics as reference segmenters/utils.py:5-86 (greedy
    first-seen grouping by IoU ≥ iou_threshold AND area ratio ≥
    area_threshold) but the IoU matrix is one batched device matmul.
    """
    n = len(masks)
    if n <= 1:
        return list(masks)

    segs = np.stack([np.asarray(m["segmentation"], dtype=bool) for m in masks])
    iou = np.asarray(mask_iou_matrix(jnp.asarray(segs)))
    areas = np.array([float(m["area"]) for m in masks])
    amin = np.minimum(areas[:, None], areas[None, :])
    amax = np.maximum(areas[:, None], areas[None, :])
    area_ratio = np.where(amax > 0, amin / amax, 0.0)
    dup = (iou >= iou_threshold) & (area_ratio >= area_threshold)

    unique_masks: List[Dict[str, Any]] = []
    processed: set = set()
    for i in range(n):
        if i in processed:
            continue
        group = [i] + [j for j in range(i + 1, n) if j not in processed and dup[i, j]]
        for j in group[1:]:
            processed.add(j)
        processed.add(i)
        if len(group) > 1:
            best = max(group, key=lambda k: masks[k].get("stability_score", 0))
            unique_masks.append(masks[best])
            if verbose:
                print(f"Found duplicate masks at indices {group}, keeping index {best}")
        else:
            unique_masks.append(masks[i])
    return unique_masks


def apply_classifier(image, masks, classifier, desired_class: Optional[int] = None,
                     min_mask_area: int = 100, batchsize: int = 32):
    """Score masks with a domain-expert classifier and keep/merge by class
    (reference masks.py:8-21)."""
    sam2_masks = np.array([np.asarray(m["segmentation"], dtype=np.uint8) for m in masks])
    predictions = classifier.batch_predict(image, sam2_masks, batchsize)
    return convert_predictions_to_masks(predictions, masks, desired_class, min_mask_area)


def convert_predictions_to_masks(predictions, masks, desired_class: Optional[int] = None,
                                 min_mask_area: int = 100):
    """Route class predictions into instance or semantic masks
    (reference masks.py:23-62)."""
    if isinstance(masks, np.ndarray):
        masks = masks_to_list(masks)
    predictions = np.asarray(predictions)
    predicted_classes = np.argmax(predictions, axis=1)

    if desired_class is not None and desired_class > 0:
        confidence_scores = predictions[:, desired_class]
        target = [i for i, p in enumerate(predicted_classes) if p == desired_class]
        masks = [masks[i] for i in target]
        confidence_scores = confidence_scores[target]
        if len(masks) > 0:
            masks = _consensus_based_resolution(
                masks[0]["segmentation"].shape, masks, confidence_scores)
            masks = [m for m in masks if m["area"] >= min_mask_area]
            masks = sorted(masks, key=lambda x: x["area"], reverse=False)
        return masks

    if len(masks) == 0:
        return np.array([])
    return _semantic_segmentation(masks, predictions)


def _consensus_based_resolution(image_shape, masks, confidences):
    """Merge overlapping same-class masks into consensus components
    (reference masks.py:64-121). Accumulation is on-device; CC on host."""
    segs = jnp.asarray(np.stack([np.asarray(m["segmentation"]) for m in masks]))
    consensus_mask, avg_conf = _consensus_maps(segs, jnp.asarray(np.asarray(confidences)))
    consensus_mask = np.asarray(consensus_mask)
    avg_conf = np.asarray(avg_conf)

    # reference uses scipy.ndimage.label defaults (4-conn 2D, masks.py:89)
    labeled, num = cc_label(consensus_mask, connectivity=1)
    out = []
    for lbl in range(1, num + 1):
        comp = labeled == lbl
        conf = float(np.mean(avg_conf[comp]))
        ys, xs = np.where(comp)
        y_min, y_max = int(ys.min()), int(ys.max())
        x_min, x_max = int(xs.min()), int(xs.max())
        out.append({
            "segmentation": comp,
            "area": int(comp.sum()),
            "bbox": [x_min, y_min, x_max - x_min, y_max - y_min],
            "predicted_iou": conf,
            "point_coords": [[int((x_min + x_max) / 2), int((y_min + y_max) / 2)]],
            "stability_score": conf,
            "crop_box": [x_min, y_min, x_max, y_max],
        })
    return out


def _semantic_segmentation(masks, predictions):
    """Merge masks per predicted class (reference masks.py:123-155)."""
    predicted_classes = np.argmax(predictions, axis=1)
    max_class = predictions.shape[1]
    shape = masks[0]["segmentation"].shape
    output = [{"segmentation": np.zeros(shape, dtype=bool), "area": 0, "label": ii}
              for ii in range(1, max_class)]
    for ii, m in enumerate(masks):
        cls = predicted_classes[ii]
        if cls > 0:
            o = output[cls - 1]
            o["segmentation"] = np.logical_or(o["segmentation"], m["segmentation"])
            o["area"] += m["area"]
    return output


def masks_to_array(mask_list):
    """List of mask dicts → (N,H,W) label stack (reference masks.py:157-183,
    with the empty-list indexing bug fixed)."""
    if not isinstance(mask_list, list):
        return None
    if len(mask_list) == 0:
        return np.zeros((0, 0, 0), dtype=bool)
    nx, ny = mask_list[0]["segmentation"].shape
    if len(mask_list) < 256:
        dtype = np.uint8
    elif len(mask_list) < 65536:
        dtype = np.uint16
    else:
        dtype = np.uint32
    masks = np.zeros([len(mask_list), nx, ny], dtype=dtype)
    for j, mask in enumerate(mask_list):
        masks[j] = np.asarray(mask["segmentation"], dtype=dtype) * (j + 1)
    return masks


def masks_to_list(masks):
    """Label array → list of mask dicts (reference masks.py:185-203)."""
    if isinstance(masks, list):
        return masks
    out = []
    for val in np.unique(masks):
        m = masks == val
        out.append({"segmentation": m, "area": int(np.sum(m > 0))})
    return out


def segments_to_mask(video_segments, masks, mask_shape):
    """Paint per-frame object masks into a (Z,H,W) label volume with
    nearest-neighbor upsampling (reference masks.py:205-228)."""
    first_obj = next(iter(next(iter(video_segments.values())).values()))
    sam_h, sam_w = np.asarray(first_obj[0]).shape
    frames = sorted(video_segments.keys())
    temp = np.zeros((len(frames), sam_h, sam_w), dtype=np.int32)
    for i, f in enumerate(frames):
        for obj_id, obj_mask in video_segments[f].items():
            temp[i][np.asarray(obj_mask[0], dtype=bool)] = obj_id
    if sam_h != mask_shape[1] or sam_w != mask_shape[2]:
        temp = np.asarray(jax.image.resize(
            jnp.asarray(temp, jnp.float32),
            (len(frames), mask_shape[1], mask_shape[2]),
            method="nearest").astype(jnp.int32))
    for i, f in enumerate(frames):
        masks[f] = temp[i]
    return masks


# ---------------------------------------------------------------------------
# Per-label adaptive Gaussian feathering
# ---------------------------------------------------------------------------

def _estimate_feature_size_3d(binary_volume, scale=0.075):
    """Equivalent-sphere diameter → sigma (reference masks.py:288-309)."""
    volume = float(np.sum(binary_volume))
    approx_diameter = 2 * ((3 * volume) / (4 * np.pi)) ** (1 / 3)
    return scale * approx_diameter


@partial(jax.jit, static_argnames=("ksize",))
def _batched_label_smooth(stack: jnp.ndarray, sigmas: jnp.ndarray, ksize: int):
    """Smooth an (L,Z,Y,X) stack of binary masks, one sigma per label, with a
    single grouped separable conv per axis.

    The reference loops labels and runs three conv3d per label
    (masks.py:264-284); here all labels are channels of one depthwise conv,
    with per-channel kernels zero-padded to a common static width.
    """
    L = stack.shape[0]
    ts = jnp.arange(-(ksize // 2), ksize // 2 + 1, dtype=jnp.float32)
    # (L, ksize) per-label kernels, normalized.
    k = jnp.exp(-(ts[None, :] ** 2) / (2.0 * jnp.maximum(sigmas[:, None], 1e-6) ** 2))
    k = k / jnp.sum(k, axis=1, keepdims=True)

    x = stack.astype(jnp.float32)[None]  # (1, L, Z, Y, X)
    pad = ksize // 2
    for axis in range(3):
        kshape = [L, 1, 1, 1, 1]
        kshape[2 + axis] = ksize
        padding = [(0, 0)] * 3
        padding[axis] = (pad, pad)
        x = jax.lax.conv_general_dilated(
            x, k.reshape(kshape),
            window_strides=(1, 1, 1), padding=padding,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            feature_group_count=L,
        )
    return x[0]


def fast_3d_gaussian_smoothing(volume, scale=0.075, deviceID=None):
    """Per-label adaptive Gaussian feathering of a 3D label map
    (reference masks.py:230-286). All labels smooth in one device launch."""
    volume = np.asarray(volume)
    if volume.ndim != 3:
        raise ValueError(f"Expected 3D input, got {volume.ndim}D")
    labels = np.unique(volume)
    labels = labels[labels != 0]
    if labels.size == 0:
        return np.zeros_like(volume, dtype=np.uint8)

    stack = np.stack([(volume == l) for l in labels]).astype(np.float32)
    sigmas = np.array([_estimate_feature_size_3d(s, scale) for s in stack], np.float32)
    # Static kernel width from the largest sigma (3-sigma rule, odd).
    kmax = int(2 * 3 * float(sigmas.max()) + 1)
    kmax = kmax + 1 if kmax % 2 == 0 else kmax
    kmax = max(kmax, 3)

    smoothed = np.asarray(_batched_label_smooth(jnp.asarray(stack), jnp.asarray(sigmas), kmax))
    result = np.zeros_like(volume, dtype=np.uint8)
    for i, l in enumerate(labels):  # ascending label order = reference overwrite order
        result[smoothed[i] > 0.5] = l
    return result
