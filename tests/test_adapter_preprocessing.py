"""Slab-wise preprocessing must match whole-volume preprocessing
(the adapter's memory-layout optimization cannot change numerics)."""

import numpy as np
import jax.numpy as jnp

from saber_tpu.adapters.preprocessing import TomogramPreprocessor


def test_slab_matches_full_volume(rng):
    vol = rng.standard_normal((6, 48, 56)).astype(np.float32) * 3 + 1
    prep = TomogramPreprocessor()
    full, h, w = prep.prepare_volume(vol, image_size=64)
    assert (h, w) == (48, 56)
    vmin, vmax = float(vol.min()), float(vol.max())
    for sl in (slice(0, 3), slice(3, 6)):
        slab = prep.prepare_slab(jnp.asarray(vol[sl]), vmin, vmax, 64)
        np.testing.assert_allclose(np.asarray(slab), np.asarray(full[sl]),
                                   atol=1e-5)


def test_range_contract(rng):
    """The (quirky but reference-faithful) double normalization lands in
    [-3, 1] (reference preprocessing.py:59 applied after normalize_tomogram)."""
    vol = rng.standard_normal((4, 32, 32)).astype(np.float32)
    prep = TomogramPreprocessor()
    frames, _, _ = prep.prepare_volume(vol, image_size=32)
    f = np.asarray(frames)
    assert f.min() >= -3.0 - 1e-4 and f.max() <= 1.0 + 1e-4


def test_light_modality_range(rng):
    vol = rng.standard_normal((4, 32, 32)).astype(np.float32)
    prep = TomogramPreprocessor(light_modality=True)
    frames, _, _ = prep.prepare_volume(vol, image_size=32)
    f = np.asarray(frames)
    assert f.min() >= -1e-3 and f.max() <= 255.0 + 1e-3
