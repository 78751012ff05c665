"""Weight-converter tests.

No real checkpoints exist in this image, so correctness is established
two ways (SURVEY.md §4 parity strategy):
1. primitive-mapping parity vs torch ops (Linear/Conv/ConvTranspose/
   LayerNorm/depthwise) — exact numerics of each layout rule;
2. a full synthetic state dict with the official key names/shapes runs
   through the converter and drives the model end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
from flax import linen as fnn

from saber_tpu.models.sam2 import SAM2, build_sam2
from saber_tpu.models.weights import (
    convert_torch_state_dict,
    expected_state_dict_shapes,
)


def _np(x):
    return x.detach().numpy()


class TestPrimitiveMappings:
    def test_linear(self, rng):
        tl = nn.Linear(6, 4)
        x = rng.standard_normal((2, 6)).astype(np.float32)
        want = _np(tl(torch.from_numpy(x)))
        dense = fnn.Dense(4)
        params = {"kernel": jnp.asarray(_np(tl.weight).T),
                  "bias": jnp.asarray(_np(tl.bias))}
        got = dense.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_conv2d(self, rng):
        tc = nn.Conv2d(3, 5, 3, stride=2, padding=1)
        x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        want = _np(tc(torch.from_numpy(x))).transpose(0, 2, 3, 1)
        conv = fnn.Conv(5, (3, 3), strides=(2, 2), padding=1)
        params = {"kernel": jnp.asarray(_np(tc.weight).transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(_np(tc.bias))}
        got = conv.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_conv_transpose2d(self, rng):
        tc = nn.ConvTranspose2d(4, 3, 2, stride=2)
        x = rng.standard_normal((1, 4, 5, 5)).astype(np.float32)
        want = _np(tc(torch.from_numpy(x))).transpose(0, 2, 3, 1)
        conv = fnn.ConvTranspose(3, (2, 2), strides=(2, 2),
                                 transpose_kernel=True)
        params = {"kernel": jnp.asarray(_np(tc.weight).transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(_np(tc.bias))}
        got = conv.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_depthwise_conv(self, rng):
        tc = nn.Conv2d(6, 6, 7, padding=3, groups=6)
        x = rng.standard_normal((1, 6, 9, 9)).astype(np.float32)
        want = _np(tc(torch.from_numpy(x))).transpose(0, 2, 3, 1)
        conv = fnn.Conv(6, (7, 7), padding=3, feature_group_count=6)
        params = {"kernel": jnp.asarray(_np(tc.weight).transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(_np(tc.bias))}
        got = conv.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_layernorm(self, rng):
        tl = nn.LayerNorm(8)
        with torch.no_grad():
            tl.weight.mul_(1.7)
            tl.bias.add_(0.3)
        x = rng.standard_normal((4, 8)).astype(np.float32)
        want = _np(tl(torch.from_numpy(x)))
        ln = fnn.LayerNorm(epsilon=1e-5)
        params = {"scale": jnp.asarray(_np(tl.weight)),
                  "bias": jnp.asarray(_np(tl.bias))}
        got = ln.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestFullConverter:
    @pytest.fixture(scope="class")
    def model(self):
        model, params = build_sam2("tiny", image_size=128)
        return model, params

    def test_synthetic_checkpoint_roundtrip(self, model, rng):
        """Official-shaped state dict → converted params → forward pass."""
        m, init_params = model
        shapes = expected_state_dict_shapes(m)
        sd = {k: (rng.standard_normal(v).astype(np.float32) * 0.02)
              for k, v in shapes.items()}
        from saber_tpu.models.sam2 import bake_pos_embed
        params = bake_pos_embed(convert_torch_state_dict(sd, m), m.config)

        # converted tree must exactly match the init tree's structure
        init_shapes = jax.tree.map(lambda x: tuple(x.shape), init_params)
        conv_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params)
        flat_i = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_flatten_with_path(init_shapes)[0]}
        flat_c = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_flatten_with_path(conv_shapes)[0]}
        missing = set(flat_i) - set(flat_c)
        extra = set(flat_c) - set(flat_i)
        assert not missing, f"converter missing params: {sorted(missing)[:8]}"
        assert not extra, f"converter extra params: {sorted(extra)[:8]}"
        for k in flat_i:
            assert flat_i[k] == flat_c[k], (k, flat_i[k], flat_c[k])

        img = jnp.asarray(rng.standard_normal((1, 128, 128, 3)).astype(np.float32))
        pts = jnp.asarray([[[60.0, 60.0], [0.0, 0.0]]])
        lbl = jnp.asarray([[1, -1]], jnp.int32)
        masks, iou, obj = m.apply({"params": params}, img, pts, lbl)
        assert np.isfinite(np.asarray(masks)).all()

    def test_maskmem_truncation(self, model, rng):
        """num_maskmem=2 keeps the first two tpos encodings
        (reference predictor.py:28-34)."""
        m2, _ = build_sam2("tiny", image_size=128, num_maskmem=2)
        shapes = expected_state_dict_shapes(m2)
        sd = {k: rng.standard_normal(v).astype(np.float32)
              for k, v in shapes.items()}
        params = convert_torch_state_dict(sd, m2)
        assert np.asarray(params["maskmem_tpos_enc"]).shape[0] == 2
        np.testing.assert_array_equal(np.asarray(params["maskmem_tpos_enc"]),
                                      sd["maskmem_tpos_enc"][:2])


def test_checkpoint_registry():
    from saber_tpu.pretrained_weights import SAM2_CHECKPOINTS, get_sam2_checkpoint
    assert set(SAM2_CHECKPOINTS) == {"tiny", "small", "base", "large"}
    cfg, path = get_sam2_checkpoint("tiny", download=False)
    assert cfg == "tiny" and path is None  # no cache in this image
    with pytest.raises(ValueError):
        get_sam2_checkpoint("giant")
