"""Propagation-core tests, modeled on the reference's tomogram predictor
smoke tests (adapters/sam3/tests/test_tomogram_predictor.py: synthetic
volume, seeding, bidirectional propagation, state reset)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saber_tpu.models.sam2 import SAM2, build_sam2
from saber_tpu.models.video import PropagationState, VideoCore, init_state

IMG = 128


@pytest.fixture(scope="module")
def core():
    model, params = build_sam2("tiny", image_size=IMG, num_maskmem=2, seed=0)
    return VideoCore(model), params


def _seed_masks(b=2):
    masks = np.zeros((b, IMG, IMG), np.float32)
    masks[0, 30:60, 30:60] = 1.0
    if b > 1:
        masks[1, 70:100, 70:100] = 1.0
    return jnp.asarray(masks)


def test_init_state_shapes(core):
    vc, _ = core
    st = init_state(3, vc.cfg)
    assert st.mem_feats.shape == (1, 3, 64, 64)  # num_maskmem=2 → 1 ring slot
    assert (st.cond_frame == -1).all() and st.cond_frame.shape == (3,)
    assert st.ptr.shape[0] == vc.cfg.max_obj_ptrs_in_encoder - 1
    assert st.mem_frames.shape == (1, 3) and st.obj_valid.all()


def test_seed_and_step(core, rng):
    vc, params = core
    frames = jnp.asarray(rng.standard_normal((3, IMG, IMG, 3)).astype(np.float32))
    backbone = vc.encode_batch(params, frames)
    frame0 = jax.tree.map(lambda x: x[:1] if x.ndim == 4 else x, backbone)

    st = init_state(2, vc.cfg)
    st, seed_logits = vc.seed(params, frame0, _seed_masks(), jnp.asarray(0), st)
    assert (np.asarray(st.cond_frame) == 0).all()
    assert seed_logits.shape == (2, IMG // 4, IMG // 4)
    # seeded logits binarize back to the input masks (downsampled)
    seeded = np.asarray(seed_logits[0] > 0)
    assert seeded[10, 10] and not seeded[0, 0]

    slab = jax.tree.map(lambda x: x[1:], VideoCore.slab_frames(backbone))
    st2, (low, scores) = vc.propagate_slab(
        params, st, slab, jnp.asarray([1, 2]), jnp.asarray(1.0))
    assert low.shape == (2, 2, IMG // 4, IMG // 4)
    assert scores.shape == (2, 2, 1)
    assert np.isfinite(np.asarray(low)).all()
    assert np.isfinite(np.asarray(scores)).all()
    # memory ring now holds frame 2 (the newest), for every object
    assert (np.asarray(st2.mem_frames[0]) == 2).all()
    assert (np.asarray(st2.ptr_frames[0]) == 2).all()
    assert (np.asarray(st2.ptr_frames[1]) == 1).all()


def test_propagation_deterministic(core, rng):
    vc, params = core
    frames = jnp.asarray(rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32))
    backbone = vc.encode_batch(params, frames)
    frame0 = jax.tree.map(lambda x: x[:1] if x.ndim == 4 else x, backbone)
    st = init_state(2, vc.cfg)
    st, _ = vc.seed(params, frame0, _seed_masks(), jnp.asarray(0), st)
    slab = jax.tree.map(lambda x: x[1:], VideoCore.slab_frames(backbone))
    _, (low1, _) = vc.propagate_slab(params, st, slab, jnp.asarray([1]), jnp.asarray(1.0))
    _, (low2, _) = vc.propagate_slab(params, st, slab, jnp.asarray([1]), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(low1), np.asarray(low2))


def test_multi_seed_batch_matches_independent_runs(core, rng):
    """Objects seeded at different frames in ONE batched state must track
    exactly as if each were propagated alone (per-object cond_frame +
    activation gating; the batch axis never mixes objects)."""
    vc, params = core
    frames = jnp.asarray(rng.standard_normal((5, IMG, IMG, 3)).astype(np.float32))
    backbone = vc.encode_batch(params, frames)
    slab = VideoCore.slab_frames(backbone)
    frame_at = lambda i: jax.tree.map(
        lambda x: x[i:i + 1] if x.ndim == 4 else x, backbone)
    masks = _seed_masks()

    # object A alone: seed at 1, forward over 2..4
    st_a = init_state(1, vc.cfg)
    st_a, _ = vc.seed(params, frame_at(1), masks[:1], jnp.asarray(1), st_a)
    _, (low_a, sc_a) = vc.propagate_slab(
        params, st_a, jax.tree.map(lambda x: x[2:], slab),
        jnp.asarray([2, 3, 4]), jnp.asarray(1.0))

    # object B alone: seed at 3, forward over 4
    st_b = init_state(1, vc.cfg)
    st_b, _ = vc.seed(params, frame_at(3), masks[1:], jnp.asarray(3), st_b)
    _, (low_b, _) = vc.propagate_slab(
        params, st_b, jax.tree.map(lambda x: x[4:], slab),
        jnp.asarray([4]), jnp.asarray(1.0))

    # batched: both objects, per-object cond frames, one scan over 2..4
    bb2 = jax.tree.map(
        lambda x: x[jnp.asarray([1, 3])] if x.ndim == 4 else x, backbone)
    st = init_state(2, vc.cfg)
    st, _ = vc.seed(params, bb2, masks, jnp.asarray([1, 3]), st)
    _, (low, sc) = vc.propagate_slab(
        params, st, jax.tree.map(lambda x: x[2:], slab),
        jnp.asarray([2, 3, 4]), jnp.asarray(1.0))

    low, sc = np.asarray(low), np.asarray(sc)
    np.testing.assert_allclose(low[:, 0], np.asarray(low_a)[:, 0], atol=2e-4)
    np.testing.assert_allclose(sc[:, 0], np.asarray(sc_a)[:, 0], atol=2e-4)
    # B inactive before its seed frame: forced-empty outputs
    assert (low[0, 1] == -10.0).all() and (low[1, 1] == -10.0).all()
    assert (sc[0, 1] == -20.0).all()
    np.testing.assert_allclose(low[2, 1], np.asarray(low_b)[0, 0], atol=2e-4)


def test_multi_seed_span_and_padding_gating(core, rng):
    """span limits tracking distance per object; invalid padding slots
    never activate."""
    vc, params = core
    frames = jnp.asarray(rng.standard_normal((4, IMG, IMG, 3)).astype(np.float32))
    backbone = vc.encode_batch(params, frames)
    slab = VideoCore.slab_frames(backbone)
    frame0 = jax.tree.map(lambda x: x[:1] if x.ndim == 4 else x, backbone)

    st = init_state(2, vc.cfg)
    st, _ = vc.seed(params, frame0, _seed_masks(), jnp.asarray(0), st,
                    valid=jnp.asarray([True, False]))
    _, (low, _) = vc.propagate_slab(
        params, st, jax.tree.map(lambda x: x[1:], slab),
        jnp.asarray([1, 2, 3]), jnp.asarray(1.0), jnp.asarray(2))
    low = np.asarray(low)
    assert (low[:, 1] == -10.0).all()            # padding slot never tracks
    assert not (low[0, 0] == -10.0).all()        # within span
    assert (low[2, 0] == -10.0).all()            # beyond span of 2


def test_empty_memory_slots_are_masked(core, rng):
    """With an empty ring, step output must depend only on the cond frame:
    filling invalid slots with garbage must not change the result."""
    vc, params = core
    frames = jnp.asarray(rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32))
    backbone = vc.encode_batch(params, frames)
    frame0 = jax.tree.map(lambda x: x[:1] if x.ndim == 4 else x, backbone)
    st = init_state(1, vc.cfg)
    st, _ = vc.seed(params, frame0, _seed_masks(1), jnp.asarray(0), st)

    frame1 = jax.tree.map(lambda x: x[1], VideoCore.slab_frames(backbone))
    _, (low_a, _) = vc.step(params, st, frame1, jnp.asarray(1), jnp.asarray(1.0))

    garbage = st.replace(
        mem_feats=jnp.ones_like(st.mem_feats) * 123.0,
        ptr=jnp.ones_like(st.ptr) * -55.0)
    _, (low_b, _) = vc.step(params, garbage, frame1, jnp.asarray(1), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(low_a), np.asarray(low_b), atol=1e-5)


def test_preferred_kv_blocking_rule():
    from saber_tpu.ops.flash_attention import preferred_kv_blocking
    assert preferred_kv_blocking(4096) == (4096, 4096)   # one block (self)
    assert preferred_kv_blocking(8256) == (8448, 4224)   # default cross bank
    s_pad, bk = preferred_kv_blocking(2112)
    assert s_pad == 2176 and bk == 2176                  # single block fits
    s_pad, bk = preferred_kv_blocking(9300)
    assert s_pad % bk == 0 and bk % 128 == 0 and bk <= 4608 and s_pad >= 9300


def test_memory_pad_is_semantically_invisible(rng):
    """The TPU path pads the assembled memory bank with bias -1e9 tokens
    that also ride num_k_exclude_rope (models/video.py _assemble_memory).
    Verify on the math path that padded and unpadded cross-attention
    agree, which is the contract the padding relies on."""
    from saber_tpu.models.memory import RoPEAttention

    b, tq, d = 2, 64, 64
    n_ptr, pad = 4, 28
    tk = 2 * tq + n_ptr                                  # 2 frames + ptrs
    attn = RoPEAttention(embedding_dim=d, num_heads=1, kv_in_dim=16,
                         rope_k_repeat=True)
    q = jnp.asarray(rng.standard_normal((b, tq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, 16)).astype(np.float32))
    bias = jnp.zeros((b, 1, 1, tk), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), q, k, k,
                       num_k_exclude_rope=n_ptr, attn_bias=bias)
    out = attn.apply(params, q, k, k, num_k_exclude_rope=n_ptr,
                     attn_bias=bias)

    k_pad = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    bias_pad = jnp.concatenate(
        [bias, jnp.full((b, 1, 1, pad), -1e9, jnp.float32)], axis=3)
    out_pad = attn.apply(params, q, k_pad, k_pad,
                         num_k_exclude_rope=n_ptr + pad, attn_bias=bias_pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_pad),
                               atol=1e-5)
