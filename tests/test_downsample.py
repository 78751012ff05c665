"""Oracle tests: Fourier-crop rescaling vs a numpy reimplementation of the
reference torch.fft semantics (saber/filters/downsample.py)."""

import numpy as np
import pytest

from saber_tpu.ops.downsample import (
    FourierRescale2D,
    FourierRescale3D,
    fourier_rescale_2d,
    fourier_rescale_3d,
)


def _ref_rescale_3d(volume, in_vs, out_vs):
    in_d, in_h, in_w = volume.shape[-3:]
    f = np.fft.fftshift(np.fft.fftn(volume, axes=(-3, -2, -1), norm="ortho"),
                        axes=(-3, -2, -1))
    dims = []
    for n, vi, vo in zip((in_d, in_h, in_w), in_vs, out_vs):
        new = int(round(n * vi / vo))
        new -= new % 2
        start = (n - new) // 2 + (n % 2)
        dims.append((start, new))
    (sd, nd), (sh, nh), (sw, nw) = dims
    f = f[..., sd:sd + nd, sh:sh + nh, sw:sw + nw]
    out = np.fft.ifftn(np.fft.ifftshift(f, axes=(-3, -2, -1)),
                       axes=(-3, -2, -1), norm="ortho")
    return out.real


def _ref_rescale_2d(image, scale):
    h, w = image.shape
    h_new = int(h / scale); h_new -= h_new % 2
    w_new = int(w / scale); w_new -= w_new % 2
    f = np.fft.fftshift(np.fft.fft2(image))
    hs = (h - h_new) // 2 + (h % 2)
    ws = (w - w_new) // 2 + (w % 2)
    f = f[hs:hs + h_new, ws:ws + w_new]
    return np.abs(np.fft.ifft2(np.fft.ifftshift(f)))


@pytest.mark.parametrize("shape", [(16, 20, 24), (15, 21, 24)])
def test_rescale3d_matches_reference(rng, shape):
    vol = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(fourier_rescale_3d(vol, 5.0, 10.0))
    want = _ref_rescale_3d(vol.astype(np.float64), (5.0,) * 3, (10.0,) * 3)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_rescale3d_batched(rng):
    vol = rng.standard_normal((2, 16, 20, 24)).astype(np.float32)
    got = np.asarray(fourier_rescale_3d(vol, 4.0, 8.0))
    for b in range(2):
        want = _ref_rescale_3d(vol[b].astype(np.float64), (4.0,) * 3, (8.0,) * 3)
        np.testing.assert_allclose(got[b], want, rtol=1e-3, atol=1e-4)


def test_rescale3d_class_api(rng):
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    out = FourierRescale3D(5.0, 10.0).run(vol)
    assert isinstance(out, np.ndarray)
    assert out.shape == (8, 8, 8)
    with pytest.raises(ValueError):
        FourierRescale3D(10.0, 5.0)


@pytest.mark.parametrize("shape,scale", [((64, 64), 2.0), ((63, 65), 1.7)])
def test_rescale2d_matches_reference(rng, shape, scale):
    img = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(fourier_rescale_2d(img, scale))
    want = _ref_rescale_2d(img.astype(np.float64), scale)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * np.abs(want).max())


def test_rescale2d_api(rng):
    img = rng.standard_normal((32, 32)).astype(np.float32)
    with pytest.raises(ValueError):
        FourierRescale2D.run(img, 0.5)
    with pytest.raises(ValueError):
        FourierRescale2D.run_resolution(img, 10.0, 5.0)
    out = FourierRescale2D.run_resolution(img, 5.0, 10.0)
    assert out.shape == (16, 16)


def test_rescale2d_preserves_lowfreq_content(rng):
    # A smooth image survives 2x Fourier cropping almost unchanged
    # (up to the reference's N_in/N_out intensity scale).
    x = np.linspace(0, 2 * np.pi, 64)
    img = (np.sin(x)[None, :] * np.cos(x)[:, None]).astype(np.float32)
    out = np.asarray(fourier_rescale_2d(img, 2.0))
    scale = (64 * 64) / (32 * 32)
    coarse = img[::2, ::2] * scale
    assert np.corrcoef(np.abs(out).ravel(), np.abs(coarse).ravel())[0, 1] > 0.99
