"""Oracle tests: Gaussian smoothing vs direct numpy convolution with the
reference's kernel constructions (saber/filters/gaussian.py)."""

import numpy as np
import pytest

from saber_tpu.ops.gaussian import (
    gaussian_smoothing,
    gaussian_smoothing_3d,
    make_gaussian_kernel,
    _integer_gaussian_kernel,
)


def _conv1d_zero(x, k, axis):
    """'same' zero-padded 1-D convolution along axis (kernel is symmetric)."""
    pad = len(k) // 2
    x = np.moveaxis(x, axis, -1)
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    out = np.zeros_like(x)
    for i in range(len(k)):
        out += k[i] * xp[..., i:i + x.shape[-1]]
    return np.moveaxis(out, -1, axis)


def test_kernel_matches_reference_construction():
    # reference gaussian.py:7-15
    for sigma in (1.0, 2.5, 5.0):
        k = make_gaussian_kernel(sigma)
        ks = max(round(sigma * 3), 3)
        ks += 1 - ks % 2
        assert len(k) == ks
        ts = np.linspace(-ks / 2, ks / 2, ks)
        want = np.exp(-((ts / sigma) ** 2) / 2)
        want /= want.sum()
        np.testing.assert_allclose(k, want, rtol=1e-6)


@pytest.mark.parametrize("dim", [0, 1, 2, -1])
def test_gaussian_smoothing_matches_oracle(rng, dim):
    x = rng.standard_normal((12, 17, 23)).astype(np.float32)
    sigma = 5.0
    got = gaussian_smoothing(x, sigma, dim=dim)
    assert isinstance(got, np.ndarray)
    k = make_gaussian_kernel(sigma)
    want = _conv1d_zero(x.astype(np.float64), k.astype(np.float64), dim)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_smoothing_3d_matches_oracle(rng):
    x = rng.standard_normal((10, 12, 14)).astype(np.float32)
    sigma = 1.5
    got = gaussian_smoothing_3d(x, sigma)
    k = _integer_gaussian_kernel(sigma).astype(np.float64)
    want = x.astype(np.float64)
    for axis in (0, 1, 2):
        want = _conv1d_zero(want, k, axis)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_smoothing_preserves_constant_interior():
    x = np.ones((9, 40, 40), np.float32)
    out = gaussian_smoothing(x, 2.0, dim=1)
    # interior (away from zero-padded borders) stays 1
    np.testing.assert_allclose(out[:, 15:25, :], 1.0, atol=1e-5)
