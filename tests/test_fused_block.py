"""Fused Pallas MultiScaleBlock kernels vs the flax path (ops/fused_block).

CPU runs the kernels in interpreter mode; the math must match the unfused
path bit-for-bit up to fp32 accumulation order.
"""

import chex
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saber_tpu.models.hiera import Hiera, MultiScaleBlock
from saber_tpu.ops.fused_block import fused_mlp, fused_window_attention


@pytest.fixture()
def block_params(rng):
    def make(shapes):
        return {k: jnp.asarray(0.05 * rng.standard_normal(v).astype(np.float32))
                for k, v in shapes.items()}
    return make


def test_fused_mlp_matches_reference(rng):
    c, hid = 64, 256
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))
    s = jnp.asarray((1 + 0.1 * rng.standard_normal(c)).astype(np.float32))
    b = jnp.asarray((0.1 * rng.standard_normal(c)).astype(np.float32))
    w1 = jnp.asarray(0.05 * rng.standard_normal((c, hid)).astype(np.float32))
    b1 = jnp.asarray(0.05 * rng.standard_normal(hid).astype(np.float32))
    w2 = jnp.asarray(0.05 * rng.standard_normal((hid, c)).astype(np.float32))
    b2 = jnp.asarray(0.05 * rng.standard_normal(c).astype(np.float32))

    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * s + b
    ref = x + jax.nn.gelu(normed @ w1 + b1, approximate=False) @ w2 + b2

    out = fused_mlp(x, s, b, w1, b1, w2, b2)
    # kernel GELU uses an erf polynomial (|err|<=1.5e-7), amplified by
    # the fc2 contraction — budget accordingly
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_fused_attention_uneven_hidden_chunking(rng):
    """Hidden dim > chunk target exercises the accumulation path."""
    c, hid = 32, 4096
    x = jnp.asarray(rng.standard_normal((1, 4, 4, c)).astype(np.float32))
    s = jnp.ones((c,)); b = jnp.zeros((c,))
    w1 = jnp.asarray(0.02 * rng.standard_normal((c, hid)).astype(np.float32))
    b1 = jnp.zeros((hid,))
    w2 = jnp.asarray(0.02 * rng.standard_normal((hid, c)).astype(np.float32))
    b2 = jnp.zeros((c,))
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    ref = x + jax.nn.gelu(normed @ w1, approximate=False) @ w2
    out = fused_mlp(x, s, b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=0)


def test_fused_block_matches_flax_block(rng):
    """One same-dim windowed block: fused == flax with shared params."""
    kw = dict(dim=32, dim_out=32, num_heads=2, window_size=4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
    ref_b = MultiScaleBlock(fused=False, **kw)
    fused_b = MultiScaleBlock(fused=True, **kw)
    params = ref_b.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(0.05 * rng.standard_normal(a.shape),
                              a.dtype), params)
    assert (jax.tree.map(lambda a: a.shape, params)
            == jax.tree.map(lambda a: a.shape,
                            fused_b.init(jax.random.PRNGKey(0), x)["params"]))
    ref = ref_b.apply({"params": params}, x)
    out = fused_b.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_transposed_attention_matches_flax_block(rng):
    """Head-packed transposed layout == flax, incl. streamed head groups
    and the padded-canvas path."""
    import saber_tpu.ops.fused_block as fb
    for kw, shape, force_hg in (
            (dict(dim=32, dim_out=32, num_heads=2, window_size=4),
             (2, 8, 8, 32), None),
            (dict(dim=64, dim_out=64, num_heads=4, window_size=4),
             (1, 16, 16, 64), 2),             # streamed head groups
            (dict(dim=32, dim_out=32, num_heads=2, window_size=6),
             (2, 16, 16, 32), None)):         # non-divisible canvas
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ref_b = MultiScaleBlock(fused=False, **kw)
        params = ref_b.init(jax.random.PRNGKey(0), x)["params"]
        params = jax.tree.map(
            lambda a: jnp.asarray(0.05 * rng.standard_normal(a.shape),
                                  a.dtype), params)
        ref = ref_b.apply({"params": params}, x)

        a, ln = params["attn"], params["norm1"]
        win, heads = kw["window_size"], kw["num_heads"]
        if force_hg is None:
            out = fused_window_attention(
                x, ln["scale"], ln["bias"], a["qkv"]["kernel"],
                a["qkv"]["bias"], a["proj"]["kernel"], a["proj"]["bias"],
                window=win, num_heads=heads, layout="transposed")
        else:
            # drive the dispatcher directly with a forced (g, hg) to pin
            # the head-group streaming path regardless of VMEM budget
            hd = kw["dim"] // heads
            nwx = shape[2] // win
            g, _ = fb._pick_attn_blocks_t(nwx, win, kw["dim"], heads, hd, 4)
            out = fb._window_attention_t(
                x, ln["scale"], ln["bias"], a["qkv"]["kernel"],
                a["qkv"]["bias"], a["proj"]["kernel"], a["proj"]["bias"],
                win, heads, None, (g, force_hg))
        # complete the block through the (layout-independent) fused MLP
        out_full = fused_mlp(
            out, params["norm2"]["scale"], params["norm2"]["bias"],
            params["mlp_fc1"]["kernel"], params["mlp_fc1"]["bias"],
            params["mlp_fc2"]["kernel"], params["mlp_fc2"]["bias"])
        np.testing.assert_allclose(np.asarray(out_full), np.asarray(ref),
                                   atol=5e-5)


def test_partitioned_attention_matches_flax_block(rng):
    """Windows whose t = window² is not sublane-aligned (no banded
    blocking exists, and the full-row last resort is over its 1024-token
    cap) run the PARTITIONED layout: window 10 on an 11-window row
    forces it. Covers gb>1 window batching, the flat widx→(wy,wx)
    decomposition, and the padded-canvas validity."""
    import saber_tpu.ops.fused_block as fb
    for shape, valid in (((1, 110, 110, 32), False),  # exact canvas
                         ((1, 108, 106, 32), True)):  # padded canvas
        kw = dict(dim=32, dim_out=32, num_heads=2, window_size=10)
        # the banded pickers must FAIL here, or this test isn't covering
        # the partitioned dispatch
        assert fb._pick_attn_blocks(11, 10, 32, 2, 16, 4) is None
        assert fb._pick_attn_blocks_t(11, 10, 32, 2, 16, 4) is None
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ref_b = MultiScaleBlock(fused=False, **kw)
        fused_b = MultiScaleBlock(fused=True, **kw)
        params = ref_b.init(jax.random.PRNGKey(0), x)["params"]
        params = jax.tree.map(
            lambda a: jnp.asarray(0.05 * rng.standard_normal(a.shape),
                                  a.dtype), params)
        ref = ref_b.apply({"params": params}, x)
        out = fused_b.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5)


def test_partitioned_picker_covers_hiera_base_stage3():
    """hiera-base stage 3 at 1024² (the 16-block window-14 stage that
    previously fell back to flax) must now be applicable: banded pickers
    fail, the partitioned picker fits."""
    from saber_tpu.ops.fused_block import fused_attention_applicable
    import saber_tpu.ops.fused_block as fb
    # canvas 70 → nwx 5, c 448, 8 heads of hd 56, bf16
    assert fb._pick_attn_blocks(5, 14, 448, 8, 56, 2) is None
    assert fb._pick_attn_blocks_t(5, 14, 448, 8, 56, 2) is None
    assert fb._pick_attn_part(8 * 25, 196, 448, 8, 56, 2) is not None
    assert fused_attention_applicable(64, 64, 14, 448, 8, jnp.bfloat16)


def test_fused_trunk_matches_flax_trunk(rng):
    """Full mini-Hiera incl. q-pool transitions + a global block: the fused
    trunk falls back per-block where the kernel doesn't apply and matches
    the unfused trunk everywhere."""
    kw = dict(embed_dim=32, num_heads=2, stages=(1, 2, 2, 1),
              global_att_blocks=(3,),
              window_pos_embed_bkg_spatial_size=(7, 7),
              window_spec=(8, 4, 4, 4), baked_pos_embed=False)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    ref_m = Hiera(fused=False, **kw)
    fused_m = Hiera(fused=True, **kw)
    params = ref_m.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(0.05 * rng.standard_normal(a.shape),
                              a.dtype), params)
    for r, o in zip(ref_m.apply({"params": params}, x),
                    fused_m.apply({"params": params}, x)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-4)


def test_fused_pool_block_matches_flax_block(rng):
    """Stage-transition block (dim doubles, 2x2 q-pool): fused == flax."""
    for kw in (dict(dim=32, dim_out=64, num_heads=2, window_size=4),
               dict(dim=48, dim_out=96, num_heads=4, window_size=8)):
        x = jnp.asarray(rng.standard_normal((2, 16, 16, kw["dim"]))
                        .astype(np.float32))
        ref_b = MultiScaleBlock(fused=False, q_stride=(2, 2), **kw)
        fused_b = MultiScaleBlock(fused=True, q_stride=(2, 2), **kw)
        params = ref_b.init(jax.random.PRNGKey(0), x)["params"]
        params = jax.tree.map(
            lambda a: jnp.asarray(0.05 * rng.standard_normal(a.shape),
                                  a.dtype), params)
        assert (jax.tree.map(lambda a: a.shape, params)
                == jax.tree.map(
                    lambda a: a.shape,
                    fused_b.init(jax.random.PRNGKey(0), x)["params"]))
        ref = ref_b.apply({"params": params}, x)
        out = fused_b.apply({"params": params}, x)
        assert out.shape == (2, 8, 8, kw["dim_out"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5)


def test_s2d_patch_embed_matches_conv(rng):
    """Space-to-depth patch embed is the exact 7x7/s4 conv (reordered sum)."""
    from saber_tpu.models.hiera import PatchEmbed
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    ref = PatchEmbed(32, space_to_depth=False)
    s2d = PatchEmbed(32, space_to_depth=True)
    params = ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.map(lambda a: a.shape, params)
            == jax.tree.map(lambda a: a.shape,
                            s2d.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(np.asarray(s2d.apply(params, x)),
                               np.asarray(ref.apply(params, x)), atol=1e-5)


def test_fused_pool_block_head_group_streaming(rng, monkeypatch):
    """Head groups streamed through the grid (stage-4-transition regime
    where the packed qkv weights exceed the VMEM budget)."""
    import saber_tpu.ops.fused_block as fb
    real_pick = fb._pick_pool_attn_blocks

    def tight(*a, **k):
        g, hg, hp = real_pick(*a, budget=640 * 2**10)
        assert hg < a[4], "budget should force streaming in this test"
        return g, hg, hp

    monkeypatch.setattr(fb, "_pick_pool_attn_blocks", tight)
    kw = dict(dim=64, dim_out=128, num_heads=4, window_size=4)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, kw["dim"]))
                    .astype(np.float32))
    ref_b = MultiScaleBlock(fused=False, q_stride=(2, 2), **kw)
    fused_b = MultiScaleBlock(fused=True, q_stride=(2, 2), **kw)
    params = ref_b.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(0.05 * rng.standard_normal(a.shape),
                              a.dtype), params)
    ref = ref_b.apply({"params": params}, x)
    out = fused_b.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_fused_block_nondivisible_window(rng):
    """H/W not multiples of the window (hiera base/small/tiny window-14
    stage): fused runs on a padded canvas with pad-after-LN masking and
    must match the flax pad->attend->crop path exactly."""
    for kw, q in ((dict(dim=32, dim_out=32, num_heads=2, window_size=6),
                   None),
                  (dict(dim=32, dim_out=64, num_heads=2, window_size=6),
                   (2, 2))):
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 32))
                        .astype(np.float32))
        ref_b = MultiScaleBlock(fused=False, q_stride=q, **kw)
        fused_b = MultiScaleBlock(fused=True, q_stride=q, **kw)
        params = ref_b.init(jax.random.PRNGKey(0), x)["params"]
        params = jax.tree.map(
            lambda a: jnp.asarray(0.05 * rng.standard_normal(a.shape),
                                  a.dtype), params)
        ref = ref_b.apply({"params": params}, x)
        out = fused_b.apply({"params": params}, x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5)


def test_fused_mlp_relu_eps_matches_reference(rng):
    """The memory-attention FFN variant: relu activation, eps=1e-5."""
    c, hid = 64, 256
    x = jnp.asarray(rng.standard_normal((1, 16, 8, c)).astype(np.float32))
    s = jnp.asarray((1 + 0.1 * rng.standard_normal(c)).astype(np.float32))
    b = jnp.asarray((0.1 * rng.standard_normal(c)).astype(np.float32))
    w1 = jnp.asarray(0.05 * rng.standard_normal((c, hid)).astype(np.float32))
    b1 = jnp.asarray(0.05 * rng.standard_normal(hid).astype(np.float32))
    w2 = jnp.asarray(0.05 * rng.standard_normal((hid, c)).astype(np.float32))
    b2 = jnp.asarray(0.05 * rng.standard_normal(c).astype(np.float32))

    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * s + b
    ref = x + jnp.maximum(normed @ w1 + b1, 0.0) @ w2 + b2

    out = fused_mlp(x, s, b, w1, b1, w2, b2, activation="relu", eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_memory_layer_fused_ffn_matches_flax(rng, monkeypatch):
    """MemoryAttentionLayer with SABER_FUSED_MEMFFN forced on (interpret
    mode on CPU) must match the flax FFN branch on the same params —
    the two branches declare identical param trees."""
    from saber_tpu.models.memory import MemoryAttentionLayer

    layer = MemoryAttentionLayer(d_model=64, dim_feedforward=128)
    tgt = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32))
    # memory length must tile the 64-token query grid (rope_k_repeat)
    mem = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))

    monkeypatch.setenv("SABER_FUSED_MEMFFN", "0")
    params = layer.init(jax.random.PRNGKey(0), tgt, mem)
    ref = layer.apply(params, tgt, mem)

    monkeypatch.setenv("SABER_FUSED_MEMFFN", "1")
    params_fused = layer.init(jax.random.PRNGKey(0), tgt, mem)
    chex.assert_trees_all_equal_shapes(params, params_fused)
    out = layer.apply(params, tgt, mem)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=0)


def test_picker_sweep_all_configs_and_sizes():
    """Every windowed stage geometry of every SAM2 config at common image
    sizes must either pick a Mosaic-legal blocking (banded padded,
    banded transposed, or partitioned) within the VMEM budget, or be
    declared inapplicable — and the picked VMEM estimates must carry the
    measured ~1.36× Mosaic-overhead margin under the 16 MiB limit."""
    import saber_tpu.ops.fused_block as fb
    from saber_tpu.models.sam2 import PRESETS

    LIMIT = 16 * 2**20
    MARGIN = 1.36
    for cfg_name, p in PRESETS.items():
        dim, heads = p["embed_dim"], 1 if cfg_name in ("tiny", "small") \
            else p["num_heads"]
        heads = p["num_heads"]
        # 512/1024 (the shipped bench sizes) must be fully covered;
        # 2048 is off the recommended direct-encode path (sliding window
        # above 1280 px, Fourier-crop above 2048 — segmenters/micro.py)
        # and one geometry there (base s4: window 7, nwx 10, 16 heads of
        # hd 56) legitimately falls back to flax: every kernel layout
        # either misaligns or lands within ~5% of the 16 MiB scoped-VMEM
        # limit after the measured 1.36× Mosaic overhead — too thin to
        # ship (the round-5 AMG compile failure was a 0.25% overshoot).
        for image_size in (512, 1024):
            side0 = image_size // 4
            d, h = dim, heads
            for stage in range(4):
                if stage:
                    d, h = d * 2, h * 2
                side = side0 // (2 ** stage)
                window = p["window_spec"][stage]
                hd = d // h
                canvas = side + (window - side % window) % window
                nwx = canvas // window
                xb = 2  # bf16 on TPU
                # what the dispatcher would do, in order
                pick_t = fb._pick_attn_blocks_t(nwx, window, d, h, hd, xb)
                pick_p = fb._pick_attn_blocks(nwx, window, d, h, hd, xb)
                nw = 8 * nwx * nwx
                pick_part = fb._pick_attn_part(nw, window * window, d, h,
                                               hd, xb)
                assert pick_t or pick_p or pick_part, (
                    cfg_name, image_size, stage,
                    "no layout applies — stage would fall back to flax")
                if pick_t:
                    est = fb._attn_vmem_t(pick_t[0] * window * window, d,
                                          pick_t[1], hd, 
                                          1 if pick_t[1] == h else 2, xb)
                    assert est * MARGIN <= LIMIT, (cfg_name, stage, est)
                if pick_part:
                    est = fb._attn_vmem_part(pick_part, window * window,
                                             d, h, hd, xb)
                    assert est * MARGIN <= LIMIT, (cfg_name, stage, est)
