"""Separable Gaussian smoothing (reference saber/filters/gaussian.py).

TPU-native: depthwise `lax.conv_general_dilated` passes; no host round trips.
Two kernel constructions are preserved from the reference (they differ!):

- `gaussian_smoothing` (1-D along a chosen dim, gaussian.py:7-74):
  kernel size ks = max(round(3σ), 3), forced odd; taps at
  `linspace(-ks/2, ks/2, ks)`; zero ("same") padding.
- `gaussian_smoothing_3d` (gaussian.py:76-138): kernel size 2·3σ+1 forced
  odd; taps at integer offsets; three separable conv3d passes, zero padding.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_gaussian_kernel(sigma: float) -> np.ndarray:
    """Reference kernel (gaussian.py:7-15): linspace taps over ±ks/2."""
    ks = round(sigma * 3)
    ks = max(ks, 3)
    ks += 1 - ks % 2
    ts = np.linspace(-ks / 2, ks / 2, ks)
    gauss = np.exp(-((ts / sigma) ** 2) / 2)
    return (gauss / gauss.sum()).astype(np.float32)


def _integer_gaussian_kernel(sigma: float) -> np.ndarray:
    """Reference 3D kernel (gaussian.py:97-103): integer taps, 3σ rule."""
    ks = int(2 * 3 * sigma + 1)
    ks = ks + 1 if ks % 2 == 0 else ks
    ts = np.arange(-(ks // 2), ks // 2 + 1, dtype=np.float32)
    gauss = np.exp(-(ts**2) / (2 * sigma**2))
    return (gauss / gauss.sum()).astype(np.float32)


def _conv1d_along(x: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Convolve an N-D array with a 1-D kernel along `axis`, zero-padded same.

    Computed as a statically unrolled sum of shifted slices (one fused
    elementwise pass). The previous formulation — transpose + rank-1
    depthwise conv with all other dims folded into batch — hit a
    pathological XLA conv path on TPU: smoothing a 512-cubed volume took
    365 s; the shifted-add form is bandwidth-bound (~tens of ms)."""
    x = jnp.asarray(x, jnp.float32)
    ks = kernel.shape[0]
    pad = ks // 2
    n = x.shape[axis]
    padcfg = [(0, 0)] * x.ndim
    padcfg[axis] = (pad, pad)
    xp = jnp.pad(x, padcfg)
    out = None
    for t in range(ks):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + n)
        term = float(kernel[t]) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


@partial(jax.jit, static_argnames=("sigma", "dim"))
def _smooth(x: jnp.ndarray, sigma: float, dim: int) -> jnp.ndarray:
    return _conv1d_along(x, make_gaussian_kernel(sigma), dim)


def gaussian_smoothing(input_tensor, sigma: float, dim: int = -1):
    """1-D Gaussian smoothing along `dim` (reference gaussian.py:17-74).

    Device arrays keep their dtype on entry and widen to fp32 INSIDE the
    jitted kernel (``_conv1d_along``'s leading cast) — fp16 wire uploads
    (``preprocessing.upload_volume(..., widen=False)``) smooth without a
    separate convert program, which matters on remote-TPU relays where
    every distinct executable pays first-call loader overhead. Output is
    always fp32."""
    return_numpy = isinstance(input_tensor, np.ndarray)
    x = (jnp.asarray(np.asarray(input_tensor, np.float32)) if return_numpy
         else jnp.asarray(input_tensor))
    dim = dim % x.ndim
    out = _smooth(x, float(sigma), dim)
    return np.asarray(out) if return_numpy else out


@partial(jax.jit, static_argnames=("sigma",))
def _smooth3d(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    k = _integer_gaussian_kernel(sigma)
    for axis in (0, 1, 2):
        x = _conv1d_along(x, k, axis)
    return x


def gaussian_smoothing_3d(volume, sigma: float, device=None):
    """Separable 3-D Gaussian filter (reference gaussian.py:76-138)."""
    return_numpy = isinstance(volume, np.ndarray)
    x = jnp.asarray(volume, jnp.float32)
    out = _smooth3d(x, float(sigma))
    return np.asarray(out) if return_numpy else out
