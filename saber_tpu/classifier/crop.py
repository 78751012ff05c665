"""Mask-centric adaptive cropping (reference
saber/classifier/datasets/RandMaskCrop.py).

Crop a square window around the mask's bbox with margin 1.5×, optional
±25 px jitter at train time, resized to 320². Used identically at train
and inference time (reference predictor.py:208-234).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CROP_SIZE = 320
MARGIN = 1.5
JITTER = 25


def crop_and_resize_adaptive(image: np.ndarray, mask: np.ndarray,
                             crop_size: int = CROP_SIZE,
                             margin: float = MARGIN,
                             jitter: Optional[np.random.Generator] = None
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Crop (image, mask) around the mask with margin; resize to crop_size²."""
    image = np.asarray(image)
    mask = np.asarray(mask)
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        cy, cx, half = h // 2, w // 2, min(h, w) // 2
    else:
        y0, y1 = ys.min(), ys.max()
        x0, x1 = xs.min(), xs.max()
        cy, cx = (y0 + y1) // 2, (x0 + x1) // 2
        half = int(max(y1 - y0, x1 - x0) * margin / 2) + 1
    if jitter is not None:
        cy += int(jitter.integers(-JITTER, JITTER + 1))
        cx += int(jitter.integers(-JITTER, JITTER + 1))
    half = max(half, 8)

    y0, y1 = cy - half, cy + half
    x0, x1 = cx - half, cx + half
    pad_y0, pad_x0 = max(0, -y0), max(0, -x0)
    pad_y1, pad_x1 = max(0, y1 - h), max(0, x1 - w)
    img_c = np.pad(image, ((pad_y0, pad_y1), (pad_x0, pad_x1)))[
        y0 + pad_y0:y1 + pad_y0, x0 + pad_x0:x1 + pad_x0]
    msk_c = np.pad(mask, ((pad_y0, pad_y1), (pad_x0, pad_x1)))[
        y0 + pad_y0:y1 + pad_y0, x0 + pad_x0:x1 + pad_x0]

    # Pin to the host CPU backend: crop shapes vary per mask, and on the
    # remote-TPU relay every new shape would otherwise pay a ~45-60 s
    # remote compile (same rationale as the presence fit, ops/thickness.py)
    with jax.default_device(jax.devices("cpu")[0]):
        img_r = np.asarray(jax.image.resize(
            jnp.asarray(img_c, jnp.float32), (crop_size, crop_size),
            "bilinear"))
        msk_r = np.asarray(jax.image.resize(
            jnp.asarray(msk_c, jnp.float32), (crop_size, crop_size),
            "nearest"))
    return img_r, msk_r
