"""Oracle tests: saber_tpu.ops.preprocessing vs scipy/numpy.

Mirrors the math of reference saber/utils/preprocessing.py exactly.
"""

import numpy as np
import pytest
from scipy.ndimage import uniform_filter as scipy_uniform

from saber_tpu.ops import preprocessing as prep


def _ref_contrast(image, std_cutoff=5, size=500):
    image_mean = scipy_uniform(image, size=size)
    image_sq = scipy_uniform(image**2, size=size)
    image_var = np.clip(image_sq - image_mean**2, a_min=0, a_max=None)
    image_std = np.sqrt(image_var)
    out = (image - image_mean) / (image_std + 1e-8)
    return np.clip(out, -std_cutoff, std_cutoff)


@pytest.mark.parametrize("size", [5, 16, 64])
def test_uniform_filter_matches_scipy(rng, size):
    x = rng.standard_normal((73, 91)).astype(np.float32)
    got = np.asarray(prep.uniform_filter(x, size))
    want = scipy_uniform(x.astype(np.float64), size=size).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_contrast_matches_reference(rng):
    x = (rng.standard_normal((128, 160)) * 10 + 3).astype(np.float32)
    got = np.asarray(prep.contrast(x, std_cutoff=3, size=64))
    want = _ref_contrast(x.astype(np.float64), std_cutoff=3, size=64).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_contrast_window_larger_than_image(rng):
    # size=500 default with a smaller image must clamp, not crash.
    x = rng.standard_normal((96, 80)).astype(np.float32)
    out = np.asarray(prep.contrast(x))
    assert out.shape == x.shape
    assert np.all(np.abs(out) <= 5.0 + 1e-6)


def test_normalize(rng):
    x = rng.standard_normal((50, 60)).astype(np.float32) * 7 + 2
    got = np.asarray(prep.normalize(x))
    want = (x - x.min()) / (x.max() - x.min() + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.min() >= 0 and got.max() <= 1.0 + 1e-6


def test_normalize_rgb_axiswise(rng):
    x = rng.standard_normal((20, 30, 3)).astype(np.float32)
    got = np.asarray(prep.normalize(x, rgb=True))
    for c in range(3):
        ch = x[..., c]
        want = (ch - ch.min()) / (ch.max() - ch.min() + 1e-8)
        np.testing.assert_allclose(got[..., c], want, rtol=1e-5, atol=1e-6)


def test_project_tomogram(rng):
    vol = rng.standard_normal((20, 16, 18)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(prep.project_tomogram(vol)), vol.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(prep.project_tomogram(vol, zSlice=5)), vol[5])
    got = np.asarray(prep.project_tomogram(vol, zSlice=5, deltaZ=3))
    np.testing.assert_allclose(got, vol[2:8].mean(0), rtol=1e-5)
    # clipping at edges
    got = np.asarray(prep.project_tomogram(vol, zSlice=1, deltaZ=5))
    np.testing.assert_allclose(got, vol[0:6].mean(0), rtol=1e-5)


def test_prepare_rgb(rng):
    x = rng.standard_normal((96, 96)).astype(np.float32)
    out = np.asarray(prep.prepare(x, to_rgb=True))
    assert out.shape == (96, 96, 3)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[..., 0], out[..., 1])
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6


def test_upload_volume_cpu_noop(rng):
    vol = rng.standard_normal((4, 8, 8)).astype(np.float32)
    out = prep.upload_volume(vol)
    assert out.dtype == np.float32 if hasattr(out, "dtype") else True
    np.testing.assert_array_equal(np.asarray(out), vol)


def test_upload_volume_fp16_wire(monkeypatch, rng):
    """On accelerator backends host fp32 ships fp16 then widens on device:
    result == fp32(fp16(x)), dtype fp32."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    vol = rng.standard_normal((4, 8, 8)).astype(np.float32)
    out = np.asarray(prep.upload_volume(vol))
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, vol.astype(np.float16).astype(np.float32))
    # non-fp32 inputs and device arrays upload unchanged
    v64 = vol.astype(np.float64)
    np.testing.assert_array_equal(np.asarray(prep.upload_volume(v64)), vol)


def test_upload_volume_raw_int_wire(monkeypatch, rng):
    """int8/uint8/int16/uint16 sources ship raw (exact) and widen to fp32
    on device; widen=False keeps the narrow resident dtype."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for dt in (np.int8, np.uint8, np.int16, np.uint16):
        info = np.iinfo(dt)
        vol = rng.integers(info.min, info.max, (4, 8, 8)).astype(dt)
        out = prep.upload_volume(vol)
        assert out.dtype == np.float32
        np.testing.assert_array_equal(np.asarray(out), vol.astype(np.float32))
        narrow = prep.upload_volume(vol, widen=False)
        assert narrow.dtype == dt
        np.testing.assert_array_equal(np.asarray(narrow), vol)
    # int32 can exceed fp16/fp32-exact range — takes the generic fp32 path
    v32 = rng.integers(0, 1 << 20, (4, 8, 8)).astype(np.int32)
    assert prep.upload_volume(v32).dtype == np.float32
