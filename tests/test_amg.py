"""AMG pipeline tests: schema, static capacity, filters, crop hierarchy.

Run with a small random-weight model (the reference smoke tests likewise
use synthetic inputs, adapters/sam3/tests/test_tomogram_predictor.py) —
assertions target pipeline mechanics, not mask quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saber_tpu.amg import (AutomaticMaskGenerator, _paste_one, build_amg,
                           generate_crop_boxes)
from saber_tpu.config import AMGConfig
from saber_tpu.models.sam2 import build_sam2

IMG = 128


@pytest.fixture(scope="module")
def tiny():
    return build_sam2("tiny", image_size=IMG, seed=0)


def _loose_cfg(**kw):
    base = dict(npoints=4, points_per_batch=8, pred_iou_thresh=0.01,
                stability_score_thresh=0.0, crop_n_layers=0, use_m2m=False,
                max_masks=16)
    base.update(kw)
    return AMGConfig(**base)


def test_generate_crop_boxes():
    boxes, layers = generate_crop_boxes((100, 200), 1, 0.25)
    assert boxes[0] == [0, 0, 200, 100] and layers[0] == 0
    assert len(boxes) == 5  # full + 2x2
    assert all(l == 1 for l in layers[1:])
    for x0, y0, x1, y1 in boxes:
        assert 0 <= x0 < x1 <= 200 and 0 <= y0 < y1 <= 100


def test_amg_schema_and_capacity(tiny, rng):
    model, params = tiny
    amg = AutomaticMaskGenerator(model, params, _loose_cfg())
    img = rng.random((IMG, IMG)).astype(np.float32)
    masks = amg.generate(img)
    assert isinstance(masks, list)
    assert len(masks) <= 16  # static capacity respected
    if masks:
        m = masks[0]
        for key in ("segmentation", "area", "bbox", "predicted_iou",
                    "point_coords", "stability_score", "crop_box"):
            assert key in m, key
        assert m["segmentation"].shape == (IMG, IMG)
        assert m["segmentation"].dtype == bool
        assert m["area"] == int(m["segmentation"].sum())
        ious = [mm["predicted_iou"] for mm in masks]
        assert ious == sorted(ious, reverse=True)


def test_amg_strict_threshold_empty(tiny, rng):
    model, params = tiny
    amg = AutomaticMaskGenerator(model, params, _loose_cfg(pred_iou_thresh=0.999))
    img = rng.random((IMG, IMG)).astype(np.float32)
    assert amg.generate(img) == []


def test_amg_m2m_path(tiny, rng):
    model, params = tiny
    amg = AutomaticMaskGenerator(model, params, _loose_cfg(use_m2m=True, npoints=2))
    img = rng.random((IMG, IMG)).astype(np.float32)
    masks = amg.generate(img)
    assert isinstance(masks, list)


def test_amg_crop_layers(tiny, rng):
    model, params = tiny
    amg = AutomaticMaskGenerator(
        model, params, _loose_cfg(crop_n_layers=1, npoints=2, max_masks=8))
    img = rng.random((IMG, IMG, 3)).astype(np.float32)
    masks = amg.generate(img)
    assert isinstance(masks, list)
    # crop boxes recorded per candidate
    for m in masks:
        assert len(m["crop_box"]) == 4


@pytest.mark.parametrize("crop", [(0, 0, 100, 80), (7, 13, 53, 41),
                                  (60, 40, 40, 40)])
def test_paste_one_matches_resize_and_paste(crop, rng):
    """The matmul-form warp paste must equal bilinear-resize + placement
    (what torch AMG does: F.interpolate to crop size, threshold, uncrop)."""
    h, w, low = 80, 100, 16
    x0, y0, cw, ch = crop
    mask = rng.standard_normal((low, low)).astype(np.float32)
    want = np.zeros((h, w), np.float32)
    up = np.asarray(jax.image.resize(jnp.asarray(mask), (ch, cw),
                                     method="linear"))
    want[y0:y0 + ch, x0:x0 + cw] = up
    got = np.asarray(_paste_one(
        jnp.asarray(mask), jnp.asarray([x0, y0, cw, ch], jnp.float32), h, w))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_amg_filters(tiny, rng):
    model, params = tiny
    amg = build_amg(model, params, _loose_cfg(), min_area_filter=10**9)
    img = rng.random((IMG, IMG)).astype(np.float32)
    assert amg.generate(img) == []  # everything filtered by absurd area bound
    amg.set_filters(min_area_filter=0)
    assert amg.min_area_filter == 0


def test_fullres_stability_phase_matches_matrix(rng):
    """The phase-decomposed integer-factor path (amg_utils._phase_counts)
    must agree with the generic interpolation-matrix path — same bilinear
    half-pixel rule, same threshold counts."""
    from saber_tpu.ops.amg_utils import (bilinear_up_matrix,
                                         calculate_stability_score_fullres)
    n, s, out = 9, 32, 128
    logits = jnp.asarray(rng.standard_normal((n, s, s)).astype(np.float32))
    got = np.asarray(
        calculate_stability_score_fullres(logits, out, 0.0, 1.0, chunk=4))

    a = np.asarray(bilinear_up_matrix(out, s))
    up = np.einsum("Hh,khw->kHw", a, np.asarray(logits))
    up = np.einsum("Ww,kHw->kHW", a, up)
    hi = (up > 1.0).sum(axis=(-2, -1)).astype(np.float32)
    lo = (up > -1.0).sum(axis=(-2, -1)).astype(np.float32)
    want = np.where(lo > 0, hi / np.maximum(lo, 1), 1.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_amg_mesh_sharded_generate_matches_single(tiny, rng):
    """The mesh-sharded one-program generate (crop batches and decode
    chunks constrained over the 8-device `data` axis) must produce the
    same masks as the unsharded program — sharding is a layout, not a
    semantic, change."""
    from saber_tpu.parallel.mesh import make_mesh

    model, params = tiny
    # crop_n_layers=2 exercises BOTH sharding modes on 8 devices:
    # the 1-crop layer chunk-shards its 8-point decode chunks, the
    # 16-crop layer crop-shards its encoder/sweep batch
    cfg = _loose_cfg(crop_n_layers=2, points_per_batch=8)
    img = rng.random((IMG, IMG)).astype(np.float32)

    ref = AutomaticMaskGenerator(model, params, cfg).generate(img)

    mesh = make_mesh(8)
    amg = AutomaticMaskGenerator(model, params, cfg, mesh=mesh)
    got = amg.generate(img)
    assert "crop" in amg.last_shard_modes, amg.last_shard_modes
    assert "chunk" in amg.last_shard_modes, amg.last_shard_modes

    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g["predicted_iou"], r["predicted_iou"],
                                   atol=1e-5)
        np.testing.assert_allclose(g["stability_score"], r["stability_score"],
                                   atol=1e-5)
        assert g["crop_box"] == r["crop_box"]
        mismatch = (g["segmentation"] ^ r["segmentation"]).sum()
        assert mismatch <= 0.001 * g["segmentation"].size, mismatch


def test_amg_set_mesh_invalidates_programs(tiny):
    """set_mesh must drop mesh-captured generate programs."""
    from saber_tpu.parallel.mesh import make_mesh

    model, params = tiny
    amg = AutomaticMaskGenerator(model, params, _loose_cfg())
    amg._generate_cache["sentinel"] = object()
    amg._crop_fn_cache["sentinel"] = object()
    amg.set_mesh(make_mesh(8))
    assert not amg._generate_cache and not amg._crop_fn_cache
