"""Input conditioning before SAM2/SAM3 (reference saber/utils/preprocessing.py).

The reference computes a local-contrast standardization with a 500-px
``scipy.ndimage.uniform_filter`` on the host; here the same math runs
on-device as separable box filters (XLA ``reduce_window``) so it can fuse
into the encoder input pipeline and batch over z-slices.

Numerical contract (validated by tests/test_preprocessing.py against the
scipy oracle):
- ``uniform_filter(size=s)`` centers the window at ``[i - s//2, i - s//2 + s)``
  with symmetric ("reflect" in scipy terms) boundary handling.
- ``contrast`` = (x - boxmean(x)) / (boxstd(x) + 1e-8), clipped to ±std_cutoff
  (reference preprocessing.py:4-18).
- ``normalize`` = min-max to [0,1] with 1e-8 epsilon (preprocessing.py:20-37).
- ``prepare`` = contrast(std_cutoff=3) → normalize → optional RGB repeat
  (preprocessing.py:67-81).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# Narrow source dtypes that ship over the wire as-is: exact (every value
# representable in fp32) and at most 2 bytes/voxel. EM tomograms are
# commonly int8/int16 at rest (reference preprocessing contract:
# saber/utils/preprocessing.py:20-37 normalizes whatever dtype arrives).
RAW_WIRE_DTYPES = (np.int8, np.uint8, np.int16, np.uint16, np.float16)


def upload_volume(vol, widen: bool = True) -> jnp.ndarray:
    """Move a host tomogram to device, narrowing the wire format.

    Host fp32 volumes headed for an accelerator are cast to fp16 before
    the transfer and widened back on device: the values feed a bf16
    compute pipeline (8-bit mantissa), so fp16 quantization (11-bit) is
    below the compute noise floor, and the bytes on the host↔device link
    halve — worth ~15-18 s per 512³ volume on the ~15-19 MB/s remote-TPU
    relay (docs/benchmarks.md), and still a win on normal PCIe hosts.
    The host-side cast is cheap (~0.6 s per 512³, measured).

    int8/uint8/int16/uint16/fp16 sources ship RAW — exact (int16 ⊂ fp32,
    unlike an fp16 detour) and 2-4× fewer wire bytes than widening on the
    host. Normalization happens on device (``prepare_slab`` casts to fp32
    as its first op). CPU backends and other dtypes upload as fp32.

    ``widen=False`` returns the narrow device array for consumers whose
    jitted first op casts to fp32 themselves (``gaussian_smoothing``,
    ``_prepare_slab``) — that skips the standalone convert program, which
    on remote-TPU relays pays material first-call loader overhead.
    """
    if isinstance(vol, np.ndarray) and jax.default_backend() != "cpu":
        if vol.dtype == np.float32:
            wire = jnp.asarray(vol.astype(np.float16))
            return wire.astype(jnp.float32) if widen else wire
        if vol.dtype in RAW_WIRE_DTYPES:
            wire = jnp.asarray(vol)
            return wire.astype(jnp.float32) if widen else wire
    return jnp.asarray(vol, jnp.float32)


def _uniform_filter_1d(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """scipy.ndimage.uniform_filter1d with mode='reflect' (numpy 'symmetric').

    Window for output index i spans [i - size//2, i - size//2 + size).
    """
    left = size // 2
    right = size - left - 1
    n = x.shape[axis]
    # scipy reflects repeatedly when the pad exceeds the extent; emulate by
    # iterated symmetric padding (rare in practice: 500-px window on >250-px
    # images needs one level).
    pad_cfg = [(0, 0)] * x.ndim
    while left > 0 or right > 0:
        ln = min(left, n)
        rn = min(right, n)
        pad_cfg[axis] = (ln, rn)
        x = jnp.pad(x, pad_cfg, mode="symmetric")
        left -= ln
        right -= rn
        n = x.shape[axis]
    window = [1] * x.ndim
    window[axis] = size
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, tuple(window), (1,) * x.ndim, "valid"
    )
    return summed / size


def uniform_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """N-D separable box filter matching scipy.ndimage.uniform_filter."""
    x = jnp.asarray(x, jnp.float32)
    for axis in range(x.ndim):
        x = _uniform_filter_1d(x, size, axis)
    return x


@partial(jax.jit, static_argnames=("std_cutoff", "size"))
def contrast(image: jnp.ndarray, std_cutoff: float = 5.0, size: int = 500) -> jnp.ndarray:
    """Local 500-px standardization, clipped (reference preprocessing.py:4-18)."""
    image = jnp.asarray(image, jnp.float32)
    size = min(size, *image.shape)  # degenerate tiny inputs
    mean = uniform_filter(image, size)
    sq = uniform_filter(image * image, size)
    var = jnp.clip(sq - mean * mean, 0.0, None)
    std = jnp.sqrt(var)
    out = (image - mean) / (std + 1e-8)
    return jnp.clip(out, -std_cutoff, std_cutoff)


@partial(jax.jit, static_argnames=("rgb",))
def normalize(image: jnp.ndarray, rgb: bool = False) -> jnp.ndarray:
    """Min-max normalize to [0,1] (reference preprocessing.py:20-37)."""
    image = jnp.asarray(image, jnp.float32)
    if rgb:
        mn = image.min(axis=(0, 1), keepdims=True)
        mx = image.max(axis=(0, 1), keepdims=True)
    else:
        mn = image.min()
        mx = image.max()
    return (image - mn) / (mx - mn + 1e-8)


@partial(jax.jit, static_argnames=("zSlice", "deltaZ"))
def project_tomogram(vol: jnp.ndarray, zSlice: int | None = None, deltaZ: int | None = None) -> jnp.ndarray:
    """Mean z-projection of a slab (reference preprocessing.py:39-65)."""
    vol = jnp.asarray(vol)
    if zSlice is not None:
        if deltaZ is not None:
            z0 = int(max(zSlice - deltaZ, 0))
            z1 = int(min(zSlice + deltaZ, vol.shape[0]))
            return jnp.mean(vol[z0:z1], axis=0)
        return vol[zSlice]
    return jnp.mean(vol, axis=0)


@partial(jax.jit, static_argnames=("to_rgb",))
def prepare(image: jnp.ndarray, to_rgb: bool = False) -> jnp.ndarray:
    """contrast(3) → normalize → optional RGB (reference preprocessing.py:67-81)."""
    image = contrast(image, std_cutoff=3)
    image = normalize(image, rgb=False)
    if to_rgb and image.ndim == 2:
        image = jnp.repeat(image[..., None], 3, axis=2).astype(jnp.float32)
    return image
