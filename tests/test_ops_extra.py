"""Oracle tests for ops without dedicated suites: band-pass filter,
morphology, AMG primitives."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy import ndimage as ndi

from saber_tpu.ops.amg_utils import (
    batched_mask_to_box,
    batched_nms,
    box_iou,
    build_point_grid,
    calculate_stability_score,
)
from saber_tpu.ops.bandpass import Filter3D
from saber_tpu.ops.morphology import (
    ball_kernel,
    binary_closing,
    binary_dilation,
    binary_erosion,
    binary_opening,
)


class TestBandpass:
    def test_identity_when_disabled(self, rng):
        vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
        f = Filter3D(apix=10.0, sz=vol.shape)
        np.testing.assert_allclose(f.apply(vol), vol, atol=1e-4)

    def test_lowpass_removes_high_freq(self, rng):
        z = np.arange(32)
        # low-freq + high-freq component along x
        vol = (np.sin(2 * np.pi * z / 32)[None, None, :]
               + np.sin(2 * np.pi * z / 2)[None, None, :]
               ).astype(np.float32) * np.ones((32, 32, 1), np.float32)
        f = Filter3D(apix=10.0, sz=vol.shape, lp=40.0, lpd=2)
        out = f.apply(vol)
        # energy at the Nyquist-ish frequency collapses
        spec_in = np.abs(np.fft.fftn(vol))
        spec_out = np.abs(np.fft.fftn(out))
        hi = (slice(None), slice(None), 16)  # x-frequency 16 (period 2)
        assert spec_out[hi].max() < 0.05 * spec_in[hi].max()

    def test_invalid_cutoffs(self):
        with pytest.raises(ValueError):
            Filter3D(apix=10.0, sz=(8, 8, 8), lp=100.0, hp=50.0)

    def test_profile_extraction(self):
        f = Filter3D(apix=10.0, sz=(16, 16, 16), lp=40.0, lpd=2)
        freqs, prof = f.extract_1d_profile("x")
        assert len(freqs) == len(prof)
        assert prof.max() <= 1.0 + 1e-6


class TestMorphology:
    @pytest.mark.parametrize("radius", [1, 2])
    def test_dilation_matches_scipy(self, rng, radius):
        m = rng.random((12, 16, 14)) > 0.85
        got = np.asarray(binary_dilation(jnp.asarray(m), radius))
        se = ball_kernel(radius).astype(bool)
        want = ndi.binary_dilation(m, structure=se)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("radius", [1, 2])
    def test_erosion_matches_scipy(self, rng, radius):
        m = ndi.binary_dilation(rng.random((12, 16, 14)) > 0.9,
                                iterations=3)
        got = np.asarray(binary_erosion(jnp.asarray(m), radius))
        se = ball_kernel(radius).astype(bool)
        want = ndi.binary_erosion(m, structure=se)
        np.testing.assert_array_equal(got, want)

    def test_opening_closing(self, rng):
        m = np.zeros((10, 20, 20), bool)
        m[3:8, 5:15, 5:15] = True
        m[0, 0, 0] = True  # speck removed by opening
        opened = np.asarray(binary_opening(jnp.asarray(m), 1))
        assert not opened[0, 0, 0]
        assert opened[5, 10, 10]
        closed = np.asarray(binary_closing(jnp.asarray(m), 1))
        assert closed[5, 10, 10]


class TestAMGPrimitives:
    def test_mask_to_box(self):
        masks = np.zeros((3, 16, 16), bool)
        masks[0, 2:5, 3:9] = True
        masks[1, 0, 0] = True
        got = np.asarray(batched_mask_to_box(jnp.asarray(masks)))
        np.testing.assert_array_equal(got[0], [3, 2, 8, 4])  # XYXY inclusive
        np.testing.assert_array_equal(got[1], [0, 0, 0, 0])
        np.testing.assert_array_equal(got[2], [0, 0, 0, 0])  # empty → zeros

    def test_box_iou(self):
        b1 = jnp.asarray([[0.0, 0, 10, 10]])
        b2 = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
        got = np.asarray(box_iou(b1, b2))[0]
        np.testing.assert_allclose(got, [1.0, 25 / 175, 0.0], rtol=1e-5)

    def test_nms_against_bruteforce(self, rng):
        n = 24
        boxes = rng.random((n, 2)) * 40
        boxes = np.concatenate([boxes, boxes + 5 + rng.random((n, 2)) * 15],
                               axis=1).astype(np.float32)
        scores = rng.random(n).astype(np.float32)
        valid = rng.random(n) > 0.2
        keep = np.asarray(batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                      jnp.asarray(valid), 0.5))

        # brute-force greedy NMS
        iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
        order = np.argsort(-np.where(valid, scores, -np.inf))
        expected = np.zeros(n, bool)
        suppressed = np.zeros(n, bool)
        for i in order:
            if not valid[i] or suppressed[i]:
                continue
            expected[i] = True
            suppressed |= iou[i] > 0.5
        np.testing.assert_array_equal(keep, expected)

    def test_stability_score(self):
        logits = jnp.asarray([np.linspace(-2, 2, 256).reshape(16, 16)])
        s = np.asarray(calculate_stability_score(logits, 0.0, 0.5))
        hi = (np.asarray(logits[0]) > 0.5).sum()
        lo = (np.asarray(logits[0]) > -0.5).sum()
        np.testing.assert_allclose(s[0], hi / lo, rtol=1e-5)

    def test_point_grid(self):
        g = np.asarray(build_point_grid(4))
        assert g.shape == (16, 2)
        assert g.min() == pytest.approx(1 / 8)
        assert g.max() == pytest.approx(7 / 8)


def test_mask_downsampler_matches_manual_replay(rng):
    """Pin MaskDownSampler semantics: stride-2 SAME conv pyramid with
    LayerNorm(1e-6) + exact GELU between stages and a final 1×1 — the
    manual replay below is the contract a reformulation must satisfy
    (the round-3 shifted-slice variant passed this but measured slower
    on-chip and was reverted)."""
    import jax
    import jax.numpy as jnp

    from saber_tpu.models.memory import MaskDownSampler

    m = MaskDownSampler(embed_dim=8, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    got = np.asarray(m.apply({"params": params}, x))

    ref = x
    ch = 1
    for i in range(4):
        p = params[f"encoder_{i}_conv"]
        ref = jax.lax.conv_general_dilated(
            ref, p["kernel"], (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
        ln = params[f"encoder_{i}_ln"]
        mu = ref.mean(-1, keepdims=True)
        var = ((ref - mu) ** 2).mean(-1, keepdims=True)
        ref = (ref - mu) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]
        ref = jax.nn.gelu(ref, approximate=False)
        ch *= 4
    fc = params["final_conv"]
    ref = jax.lax.conv_general_dilated(
        ref, fc["kernel"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + fc["bias"]
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_mask_downsampler_blocked_matches_direct(rng, monkeypatch):
    """The blocked (space-to-depth) path is exact vs the direct conv
    pyramid up to fp32 accumulation reordering — same params, both paths
    forced via the module flag."""
    import jax
    import jax.numpy as jnp

    import saber_tpu.models.memory as mem

    m = mem.MaskDownSampler(embed_dim=8, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]

    monkeypatch.setattr(mem, "_BLOCKED_MDS", True)
    blocked = np.asarray(m.apply({"params": params}, x))
    monkeypatch.setattr(mem, "_BLOCKED_MDS", False)
    direct = np.asarray(m.apply({"params": params}, x))
    np.testing.assert_allclose(blocked, direct, atol=2e-5, rtol=2e-5)
