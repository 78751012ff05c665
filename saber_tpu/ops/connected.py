"""Connected components and compact relabeling.

XLA has no CC primitive (SURVEY.md §7 "hard parts"), so two paths exist:

- Host path (`label`, `separate_masks`): scipy.ndimage union-find; used by
  post-processing code that already lives at the numpy boundary
  (reference saber/segmenters/utils.py:88-131, masks.py:89).
  A C++ two-pass union-find drop-in lives in saber_tpu/native and is used
  automatically when built (it is ~scipy-compatible but faster on large
  volumes).
- Device path (`label_device_2d`): iterative min-propagation with
  ``lax.reduce_window`` for jit-compiled pipelines that need provisional
  labels without leaving the device (bounded sweeps; exact for objects
  whose geodesic diameter ≤ 2·num_iters).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi


def label(mask: np.ndarray, connectivity: int | None = None):
    """Connected-component labeling (host). Returns (labels, num).

    connectivity: scipy-style; None → full connectivity (rank) like the
    reference's 26-connectivity for 3D (segmenters/utils.py:107).
    """
    mask = np.ascontiguousarray(np.asarray(mask).astype(bool))
    rank = mask.ndim
    conn = rank if connectivity is None else connectivity
    # native run-based union-find for 2D and 3D: with the id→label remap
    # resolved as a table (not a per-voxel find), it measures 1.5-2.2×
    # scipy on 2D masks ≤1024² and 1.8× on 3D (docs/benchmarks.md);
    # scipy remains the fallback when the shared lib is unavailable.
    if rank in (2, 3):
        try:
            from saber_tpu.native import cc as _cc
            return _cc.label(mask, conn)
        except Exception:
            pass
    structure = ndi.generate_binary_structure(rank, conn)
    return ndi.label(mask, structure=structure)


def separate_masks(combined_mask: np.ndarray, min_mask_area: int = 100) -> np.ndarray:
    """3D CC with small-object removal + compact relabel.

    Contract matches reference saber/segmenters/utils.py:88-131:
    26-connectivity, min volume = 10 * min_mask_area, uint32 output, bbox
    crop for speed.
    """
    m = np.ascontiguousarray(np.asarray(combined_mask).astype(bool))
    if not m.any():
        return np.zeros_like(m, dtype=np.uint32)

    z, y, x = np.where(m)
    z0, z1 = z.min(), z.max() + 1
    y0, y1 = y.min(), y.max() + 1
    x0, x1 = x.min(), x.max() + 1
    sub = m[z0:z1, y0:y1, x0:x1]

    labels_sub, _ = label(sub, connectivity=3)
    labels_sub = labels_sub.astype(np.int64)

    min_vol = min_mask_area * 10
    if min_vol > 1:
        counts = np.bincount(labels_sub.ravel())
        small = np.flatnonzero((counts < min_vol) & (np.arange(counts.size) != 0))
        if small.size:
            keep_lut = np.ones(counts.size, dtype=bool)
            keep_lut[small] = False
            labels_sub = np.where(keep_lut[labels_sub], labels_sub, 0)

    counts = np.bincount(labels_sub.ravel())
    keep = counts > 0
    keep[0] = False
    new_ids = np.cumsum(keep).astype(np.uint32)
    remap = np.zeros_like(new_ids, dtype=np.uint32)
    remap[keep] = new_ids[keep]
    labels_sub = remap[labels_sub]

    labeled = np.zeros(m.shape, dtype=np.uint32)
    labeled[z0:z1, y0:y1, x0:x1] = labels_sub
    return labeled


@partial(jax.jit, static_argnames=("num_iters", "connectivity"))
def label_device_2d(mask: jnp.ndarray, num_iters: int = 64, connectivity: int = 2) -> jnp.ndarray:
    """On-device provisional 2D labeling by iterative min-propagation.

    Each foreground pixel starts with a unique id; every sweep takes the min
    id over its (4- or 8-) neighborhood restricted to the foreground.
    After `num_iters` sweeps, components with geodesic radius ≤ num_iters
    carry a single id. Background is 0; ids are arbitrary but distinct.
    """
    mask = jnp.asarray(mask).astype(bool)
    h, w = mask.shape
    init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1)
    big = jnp.int32(h * w + 2)
    lab = jnp.where(mask, init, big)

    if connectivity == 2:
        window = (3, 3)
    else:
        window = (3, 3)  # 4-conn handled by masking corners below

    def sweep(lab, _):
        if connectivity == 2:
            prop = jax.lax.reduce_window(
                lab, big, jax.lax.min, window, (1, 1), "SAME")
        else:
            up = jnp.pad(lab, ((1, 0), (0, 0)), constant_values=big)[:-1]
            dn = jnp.pad(lab, ((0, 1), (0, 0)), constant_values=big)[1:]
            lf = jnp.pad(lab, ((0, 0), (1, 0)), constant_values=big)[:, :-1]
            rt = jnp.pad(lab, ((0, 0), (0, 1)), constant_values=big)[:, 1:]
            prop = jnp.minimum(jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt)), lab)
        return jnp.where(mask, jnp.minimum(lab, prop), big), None

    lab, _ = jax.lax.scan(sweep, lab, None, length=num_iters)
    return jnp.where(mask, lab, 0)
