"""Model-stack tests: shapes, invariances, and jit-compatibility.

In the spirit of the reference's smoke tests
(saber/adapters/sam3/tests/test_tomogram_predictor.py: synthetic inputs,
shape/NaN checks) plus unit-level checks the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saber_tpu.models.hiera import Hiera, window_partition, window_unpartition
from saber_tpu.models.sam2 import SAM2, build_sam2, get_config

IMG = 128  # small image size for CPU tests → 8×8 feature map


@pytest.fixture(scope="module")
def tiny_model():
    model, params = build_sam2("tiny", image_size=IMG, seed=0)
    return model, params


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 14, 18, 8)).astype(np.float32))
    win, pad_hw = window_partition(x, 8)
    assert win.shape == (2 * 2 * 3, 8, 8, 8)
    back = window_unpartition(win, 8, pad_hw, (14, 18))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_hiera_multiscale_shapes(rng):
    model = Hiera(embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
                  global_att_blocks=(3,), window_spec=(4, 2, 2, 2),
                  window_pos_embed_bkg_spatial_size=(7, 7))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 4
    # strides 4, 8, 16, 32; channels 32, 64, 128, 256
    assert outs[0].shape == (1, 16, 16, 32)
    assert outs[1].shape == (1, 8, 8, 64)
    assert outs[2].shape == (1, 4, 4, 128)
    assert outs[3].shape == (1, 2, 2, 256)


def test_config_presets():
    for name in ("tiny", "small", "base", "large"):
        cfg = get_config(name)
        assert sum(cfg.stages) >= 12 if name != "tiny" else True
        assert cfg.backbone_channel_list[0] == cfg.embed_dim
    with pytest.raises(ValueError):
        get_config("giant")


def test_sam2_forward_shapes(tiny_model, rng):
    model, params = tiny_model
    img = jnp.asarray(rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32))
    pts = jnp.asarray([[[IMG / 2, IMG / 2]]], dtype=jnp.float32)
    lbl = jnp.ones((1, 1), jnp.int32)
    masks, iou, obj = model.apply({"params": params}, img, pts, lbl)
    f4 = IMG // 4
    assert masks.shape == (1, 3, f4, f4)          # multimask low-res
    assert iou.shape == (1, 3)
    assert obj.shape == (1, 1)
    assert np.all(np.isfinite(np.asarray(masks)))
    assert np.all(np.isfinite(np.asarray(iou)))
    assert 0.0 <= float(iou.min()) and float(iou.max()) <= 1.0  # sigmoid head


def test_encoder_decode_separation(tiny_model, rng):
    """Embeddings cached once; decode runs per prompt batch (AMG pattern)."""
    model, params = tiny_model
    img = jnp.asarray(rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32))
    backbone = model.apply({"params": params}, img, method=SAM2.encode_image)
    f16 = IMG // 16
    assert backbone["vision_features"].shape == (2, f16, f16, 256)
    assert len(backbone["backbone_fpn"]) == 3
    assert backbone["backbone_fpn"][0].shape == (2, IMG // 4, IMG // 4, 256)

    pts = jnp.asarray([[[10.0, 12.0]], [[40.0, 50.0]]], dtype=jnp.float32)
    lbl = jnp.ones((2, 1), jnp.int32)
    masks, iou, toks, obj = model.apply(
        {"params": params}, backbone, pts, lbl, method=SAM2.decode)
    assert masks.shape == (2, 3, IMG // 4, IMG // 4)
    assert toks.shape == (2, 3, 256)


def test_single_mask_output(tiny_model, rng):
    model, params = tiny_model
    img = jnp.asarray(rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32))
    backbone = model.apply({"params": params}, img, method=SAM2.encode_image)
    pts = jnp.asarray([[[20.0, 20.0]]], dtype=jnp.float32)
    lbl = jnp.ones((1, 1), jnp.int32)
    masks, iou, toks, obj = model.apply(
        {"params": params}, backbone, pts, lbl, multimask_output=False,
        method=SAM2.decode)
    assert masks.shape == (1, 1, IMG // 4, IMG // 4)
    assert iou.shape == (1, 1)


def test_memory_roundtrip(tiny_model, rng):
    """encode_memory + condition_features run with matching shapes."""
    model, params = tiny_model
    cfg = model.config
    f16 = IMG // 16
    b = 2
    vision = jnp.asarray(rng.standard_normal((b, f16, f16, 256)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((b, IMG // 4, IMG // 4, 1)).astype(np.float32))
    # memory encoder expects full-res mask vs /16 features: 16× ratio
    logits_full = jax.image.resize(logits, (b, IMG, IMG, 1), "bilinear")
    mem = model.apply({"params": params}, vision, logits_full,
                      jnp.zeros((b, 1)), method=SAM2.encode_memory)
    assert mem.shape == (b, f16 * f16, cfg.mem_dim)

    tokens = vision.reshape(b, -1, 256)
    pos = jnp.zeros_like(tokens)
    mem_pos = jnp.broadcast_to(
        model.apply({"params": params}, method=SAM2.memory_pos_enc)[None],
        mem.shape)
    out = model.apply({"params": params}, tokens, pos, mem, mem_pos, 0,
                      method=SAM2.condition_features)
    assert out.shape == tokens.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_prompt_pad_convention(tiny_model, rng):
    """SAM pads point-only prompts with one (0,0)/-1 slot; the pad token is a
    learned null token that legitimately participates in attention, so AMG
    must use a FIXED prompt width. Verify determinism at fixed width and
    batch-order independence (what actually makes batched AMG valid)."""
    model, params = tiny_model
    img = jnp.asarray(rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32))
    backbone = model.apply({"params": params}, img, method=SAM2.encode_image)

    pts = jnp.asarray([[[30.0, 40.0], [0.0, 0.0]]], dtype=jnp.float32)
    lbl = jnp.asarray([[1, -1]], dtype=jnp.int32)
    m1, *_ = model.apply({"params": params}, backbone, pts, lbl, method=SAM2.decode)
    m2, *_ = model.apply({"params": params}, backbone, pts, lbl, method=SAM2.decode)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))

    # prompts batched together give the same result as separately
    backbone2 = jax.tree.map(lambda x: jnp.concatenate([x, x], 0)
                             if x.ndim == 4 else x, backbone)
    pts_b = jnp.concatenate([pts, pts + 5.0], axis=0)
    lbl_b = jnp.concatenate([lbl, lbl], axis=0)
    mb, *_ = model.apply({"params": params}, backbone2, pts_b, lbl_b,
                         method=SAM2.decode)
    np.testing.assert_allclose(np.asarray(mb[0]), np.asarray(m1[0]), atol=1e-4)


def test_jit_decode(tiny_model, rng):
    model, params = tiny_model
    img = jnp.asarray(rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32))
    backbone = model.apply({"params": params}, img, method=SAM2.encode_image)

    @jax.jit
    def decode(params, backbone, pts, lbl):
        return model.apply({"params": params}, backbone, pts, lbl,
                           method=SAM2.decode)

    pts = jnp.asarray([[[30.0, 40.0]]], dtype=jnp.float32)
    lbl = jnp.ones((1, 1), jnp.int32)
    m1, *_ = decode(params, backbone, pts, lbl)
    m2, *_ = decode(params, backbone, pts, lbl)  # cached call
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))
