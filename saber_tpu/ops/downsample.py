"""Anti-aliased Fourier-crop rescaling (reference saber/filters/downsample.py).

XLA-FFT replacements for the reference's torch.fft pipeline. Numerical
contract matches the reference exactly (validated against a numpy oracle in
tests/test_downsample.py):

- 3D (`FourierRescale3D`, downsample.py:4-129): fftn(norm='ortho') →
  fftshift → centered crop to even dims with odd-dim start correction →
  ifftshift → ifftn(norm='ortho') → real part.
- 2D (`FourierRescale2D`, downsample.py:131-204): unnormalized fft2 →
  crop → ifft2 → **abs** (the reference keeps torch defaults, so the 2D
  path rescales intensity by N_in/N_out; we reproduce that).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _crop_dims(in_shape, in_voxel, out_voxel):
    """Centered Fourier-crop geometry (reference downsample.py:99-129)."""
    starts, sizes = [], []
    for n, vi, vo in zip(in_shape, in_voxel, out_voxel):
        new = int(round(n * vi / vo))
        new -= new % 2  # force even
        start = (n - new) // 2 + (n % 2)
        starts.append(start)
        sizes.append(new)
    return starts, sizes


@partial(jax.jit, static_argnames=("starts", "sizes"))
def _rescale3d(volume: jnp.ndarray, starts, sizes) -> jnp.ndarray:
    f = jnp.fft.fftn(volume.astype(jnp.complex64), axes=(-3, -2, -1), norm="ortho")
    f = jnp.fft.fftshift(f, axes=(-3, -2, -1))
    sl = (...,) + tuple(slice(s, s + n) for s, n in zip(starts, sizes))
    f = f[sl]
    f = jnp.fft.ifftshift(f, axes=(-3, -2, -1))
    out = jnp.fft.ifftn(f, axes=(-3, -2, -1), norm="ortho")
    return out.real


def _np_rescale3d(volume: np.ndarray, starts, sizes) -> np.ndarray:
    f = np.fft.fftshift(np.fft.fftn(volume, axes=(-3, -2, -1), norm="ortho"),
                        axes=(-3, -2, -1))
    sl = (...,) + tuple(slice(s, s + n) for s, n in zip(starts, sizes))
    out = np.fft.ifftn(np.fft.ifftshift(f[sl], axes=(-3, -2, -1)),
                       axes=(-3, -2, -1), norm="ortho")
    return out.real.astype(np.float32)


def fourier_rescale_3d(volume, input_voxel_size, output_voxel_size):
    """Rescale a (Z,H,W) or (B,Z,H,W) volume by Fourier cropping."""
    from saber_tpu.ops.fft_compat import device_fft_available

    if np.isscalar(input_voxel_size):
        input_voxel_size = (input_voxel_size,) * 3
    if np.isscalar(output_voxel_size):
        output_voxel_size = (output_voxel_size,) * 3
    if any(o < i for i, o in zip(input_voxel_size, output_voxel_size)):
        raise ValueError("Output voxel size must be >= input voxel size.")
    starts, sizes = _crop_dims(np.shape(volume)[-3:], input_voxel_size,
                               output_voxel_size)
    if not device_fft_available():
        return jnp.asarray(_np_rescale3d(np.asarray(volume, np.float32),
                                         starts, sizes))
    volume = jnp.asarray(volume, jnp.float32)
    return _rescale3d(volume, tuple(starts), tuple(sizes))


@partial(jax.jit, static_argnames=("starts", "sizes"))
def _rescale2d(image: jnp.ndarray, starts, sizes) -> jnp.ndarray:
    f = jnp.fft.fftshift(jnp.fft.fft2(image.astype(jnp.complex64)))
    sl = (...,) + tuple(slice(s, s + n) for s, n in zip(starts, sizes))
    f = f[sl]
    out = jnp.fft.ifft2(jnp.fft.ifftshift(f, axes=(-2, -1)))
    return jnp.abs(out)


def fourier_rescale_2d(image, scale_factor: float):
    """Rescale an (H,W) or (B,H,W) image by `scale_factor` ≥ 1 (Fourier crop)."""
    from saber_tpu.ops.fft_compat import device_fft_available

    if scale_factor < 1:
        raise ValueError("Scale factor must be greater than 1")
    h, w = np.shape(image)[-2:]
    h_new = int(h / scale_factor)
    w_new = int(w / scale_factor)
    h_new -= h_new % 2
    w_new -= w_new % 2
    starts = ((h - h_new) // 2 + (h % 2), (w - w_new) // 2 + (w % 2))
    if not device_fft_available():
        img = np.asarray(image, np.float32)
        f = np.fft.fftshift(np.fft.fft2(img), axes=(-2, -1))
        sl = (...,) + tuple(slice(s, s + n)
                            for s, n in zip(starts, (h_new, w_new)))
        out = np.abs(np.fft.ifft2(np.fft.ifftshift(f[sl], axes=(-2, -1))))
        return jnp.asarray(out.astype(np.float32))
    image = jnp.asarray(image, jnp.float32)
    return _rescale2d(image, starts, (h_new, w_new))


class FourierRescale3D:
    """API-compatible wrapper (reference downsample.py:4-34); batch-friendly."""

    def __init__(self, input_voxel_size, output_voxel_size):
        if np.isscalar(input_voxel_size):
            input_voxel_size = (input_voxel_size,) * 3
        if np.isscalar(output_voxel_size):
            output_voxel_size = (output_voxel_size,) * 3
        if any(o < i for i, o in zip(input_voxel_size, output_voxel_size)):
            raise ValueError("Output voxel size must be >= input voxel size.")
        self.input_voxel_size = tuple(input_voxel_size)
        self.output_voxel_size = tuple(output_voxel_size)

    def run(self, volume):
        return_numpy = isinstance(volume, np.ndarray)
        out = fourier_rescale_3d(volume, self.input_voxel_size, self.output_voxel_size)
        return np.asarray(out) if return_numpy else out


class FourierRescale2D:
    """API-compatible wrapper (reference downsample.py:131-204)."""

    @staticmethod
    def run_resolution(image, input_pixsize: float, target_pixsize: float, device=None):
        if target_pixsize <= input_pixsize:
            raise ValueError(
                f"Target pixel size ({target_pixsize}Å) must be larger than "
                f"current pixel size ({input_pixsize}Å)"
            )
        return FourierRescale2D.run(image, target_pixsize / input_pixsize)

    @staticmethod
    def run(image, scale_factor: float, device=None):
        return_numpy = isinstance(image, np.ndarray)
        out = fourier_rescale_2d(image, scale_factor)
        return np.asarray(out) if return_numpy else out
