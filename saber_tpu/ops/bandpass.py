"""3D cosine band-pass filtering in frequency space.

Port of reference saber/filters/tomograms.py (`Filter3D`, a translation of
artia-wrapper's cosine_filter.m): a radially symmetric low-pass × high-pass
mask with cosine decay, applied as fftn → shiftmask → ifftn. The mask is
built once in numpy (host, cheap) and the FFT application runs on device.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def _construct_filter(r: np.ndarray, freq: float, freqdecay: float, mode: str) -> np.ndarray:
    """Cosine-decay box filter (reference tomograms.py:91-128)."""
    if mode not in ("lp", "hp"):
        raise ValueError("Mode must be 'lp' or 'hp'.")
    if freq == 0 and freqdecay == 0:
        return np.ones_like(r)
    if freq > 0 and freqdecay == 0:
        mask = (r < freq).astype(np.float32)
        return 1 - mask if mode == "hp" else mask
    half = freqdecay / 2.0
    mask = (r < freq).astype(np.float32)
    sel = (r > (freq - half)) & (r < (freq + half))
    mask[sel] = 0.5 + 0.5 * np.cos(math.pi * (r[sel] - (freq - half)) / freqdecay)
    return 1 - mask if mode == "hp" else mask


@jax.jit
def _apply_filter(data: jnp.ndarray, filt: jnp.ndarray) -> jnp.ndarray:
    f = jnp.fft.fftshift(jnp.fft.fftn(data.astype(jnp.complex64)))
    return jnp.fft.ifftn(jnp.fft.ifftshift(f * filt)).real


class Filter3D:
    """Cosine low/high-pass filter for tomograms (reference tomograms.py:12-184).

    Args:
        apix: pixel size in Å.
        sz: (D, H, W) tomogram shape.
        lp / hp: low/high-pass cutoff resolution in Å (0 disables).
        lpd / hpd: decay widths in pixels.
    """

    def __init__(self, apix, sz, lp=0, lpd=0, hp=0, hpd=0, device=None):
        self.apix = apix
        self.sz = tuple(sz)
        self.lp, self.lpd, self.hp, self.hpd = lp, lpd, hp, hpd
        if self.lp > self.hp and self.lp > 0 and self.hp > 0:
            raise ValueError(
                "Low-pass cutoff resolution must be less than high-pass cutoff resolution.")
        self.lp_pix = self.angst_to_pix(lp) if lp > 0 else 0
        self.hp_pix = self.angst_to_pix(hp) if hp > 0 else 0
        self.lpd_pix = lpd
        self.hpd_pix = hpd
        self.filter = self._cosine_filter()

    def angst_to_pix(self, ang: float) -> float:
        return max(self.sz) / (ang / self.apix)

    def _cosine_filter(self) -> np.ndarray:
        D, H, W = self.sz
        zz, yy, xx = np.meshgrid(
            np.arange(D, dtype=np.float32) - D // 2,
            np.arange(H, dtype=np.float32) - H // 2,
            np.arange(W, dtype=np.float32) - W // 2,
            indexing="ij",
        )
        r = np.sqrt(xx**2 + yy**2 + zz**2)
        lpv = _construct_filter(r, self.lp_pix, self.lpd_pix, "lp")
        hpv = _construct_filter(r, self.hp_pix, self.hpd_pix, "hp")
        return (lpv * hpv).astype(np.float32)

    def apply(self, data):
        """fftn → mask → ifftn (reference tomograms.py:162-184)."""
        from saber_tpu.ops.fft_compat import device_fft_available

        return_numpy = isinstance(data, np.ndarray)
        if not device_fft_available():
            arr = np.asarray(data, np.float32)
            f = np.fft.fftshift(np.fft.fftn(arr))
            out = np.fft.ifftn(np.fft.ifftshift(f * self.filter)).real
            out = out.astype(np.float32)
            return out if return_numpy else jnp.asarray(out)
        out = _apply_filter(jnp.asarray(data, jnp.float32), jnp.asarray(self.filter))
        return np.asarray(out) if return_numpy else out

    def extract_1d_profile(self, axis="x"):
        filt = np.asarray(self.filter)
        D, H, W = filt.shape
        if axis == "x":
            central, n = filt[D // 2, H // 2, :], W
        elif axis == "y":
            central, n = filt[D // 2, :, W // 2], H
        elif axis == "z":
            central, n = filt[:, H // 2, W // 2], D
        else:
            raise ValueError("Axis must be one of 'x', 'y', or 'z'.")
        freqs = np.fft.fftfreq(n, d=self.apix)
        mask = freqs >= 0
        return freqs[mask][::-1], central[mask]
