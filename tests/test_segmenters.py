"""End-to-end segmenter tests on synthetic volumes (the reference's test
style: synthetic random tomograms, shape/dtype contracts —
adapters/sam3/tests/test_tomogram_predictor.py)."""

import numpy as np
import pytest

from saber_tpu.config import AMGConfig, SAM2AdapterConfig
from saber_tpu.segmenters import cryoMicroSegmenter, propagationSegmenter, tomoSegmenter
from saber_tpu.segmenters.base import saber2D

IMG = 128


def _cfg(**amg_kw):
    amg = dict(npoints=4, points_per_batch=8, pred_iou_thresh=0.05,
               stability_score_thresh=0.0, crop_n_layers=0, use_m2m=False,
               max_masks=8)
    amg.update(amg_kw)
    return SAM2AdapterConfig(cfg="tiny", image_size=IMG, dtype="float32",
                             amg_cfg=AMGConfig(**amg), min_mask_area=10)


@pytest.fixture(scope="module")
def tomo_seg():
    return tomoSegmenter(cfg=_cfg())


def test_saber2d_requires_config():
    with pytest.raises(ValueError):
        saber2D()


def test_micro_segmenter(tomo_seg, rng):
    # reuse the tomo segmenter's adapter weights? no — build a micro one,
    # but share nothing: cheap at tiny/128.
    seg = cryoMicroSegmenter(cfg=_cfg())
    img = rng.standard_normal((96, 96)).astype(np.float32)
    img[30:60, 30:60] += 3.0
    masks = seg.segment(img, display=False)
    assert isinstance(masks, list)
    for m in masks:
        assert m["segmentation"].shape == (96, 96)
        assert m["area"] >= seg.min_mask_area


def test_sliding_window_coords(tomo_seg):
    seg = tomo_seg
    seg.window_size, seg.overlap_ratio = 64, 0.25
    windows = seg.get_sliding_windows((128, 128))
    assert all(y2 - y1 >= 32 and x2 - x1 >= 32 for y1, x1, y2, x2 in windows)
    assert windows[0] == (0, 0, 64, 64)


def test_tomo_segment_volume(tomo_seg, rng):
    vol = rng.standard_normal((8, 96, 96)).astype(np.float32) * 0.1
    vol[:, 30:60, 30:60] += 2.5  # a bright rod through z
    seg = tomo_seg
    seg.filter_threshold = 0.0  # random weights → don't gate on presence
    out = seg.segment(vol, thickness=2, display=False)
    if out is not None:  # random weights may find nothing — both paths valid
        assert out.shape == vol.shape
        assert out.dtype == np.uint16
    # frame metrics populated by the adapter
    if out is not None:
        assert len(seg.adapter.frame_metrics) == vol.shape[0]


def test_propagation_segmenter(rng):
    seg = propagationSegmenter(cfg=_cfg())
    seg.filter_threshold = 0.0
    vol = rng.standard_normal((6, 96, 96)).astype(np.float32) * 0.1
    vol[:, 20:50, 20:50] += 2.0
    out = seg.segment(vol, ini_depth=4, nframes=3, display=False)
    assert out.shape == vol.shape
    assert out.dtype == np.uint32  # separate_masks output


def test_batched_seed_propagation_matches_serial(rng):
    """batched_segment (all seeds in one scan) finds the same bright
    object as the serial per-seed loop."""
    seg = propagationSegmenter(cfg=_cfg())
    seg.filter_threshold = 0.0
    vol = rng.standard_normal((7, 96, 96)).astype(np.float32) * 0.1
    vol[:, 20:50, 20:50] += 2.0
    out = seg.batched_segment(vol, ini_depth=3, nframes=2)
    assert out.shape == vol.shape and out.dtype == np.uint32
    seg2 = propagationSegmenter(cfg=_cfg())
    seg2.filter_threshold = 0.0
    serial = seg2.segment(vol, ini_depth=3, nframes=2, display=False)
    if serial.max() > 0 and out.max() > 0:
        inter = np.logical_and(out > 0, serial > 0).sum()
        union = np.logical_or(out > 0, serial > 0).sum()
        assert inter / union > 0.5


def test_multidepth_batched_matches_single(rng):
    """multiDepth batched_segment (one multi-seed scan) agrees with the
    per-slab serial loop on foreground coverage."""
    from saber_tpu.segmenters.tomo import multiDepthTomoSegmenter
    seg = multiDepthTomoSegmenter(cfg=_cfg(), min_mask_area=10)
    seg.filter_threshold = 0.0
    vol = rng.standard_normal((8, 96, 96)).astype(np.float32) * 0.1
    vol[:, 30:60, 30:60] += 2.5
    serial = seg.single_segment(vol, thickness=2, num_slabs=2, delta_z=2)
    seg._vol_loaded = False
    seg.adapter.inference_state = None
    batched = seg.batched_segment(vol, thickness=2, num_slabs=2, delta_z=2)
    assert batched.shape == vol.shape
    if serial.max() > 0 and batched.max() > 0:
        inter = np.logical_and(batched > 0, serial > 0).sum()
        union = np.logical_or(batched > 0, serial > 0).sum()
        assert inter / union > 0.5
    # segment() routes to the batched path when use_batched is set
    seg._vol_loaded = False
    seg.adapter.inference_state = None
    seg.use_batched = True
    routed = seg.segment(vol, thickness=2, num_slabs=2, delta_z=2)
    np.testing.assert_array_equal(routed, batched)


def test_parallel_seed_propagation(rng):
    """Seed-farmed propagation over 2 virtual devices matches the serial
    path's output shape/type and finds the same bright object."""
    seg = propagationSegmenter(cfg=_cfg())
    seg.filter_threshold = 0.0
    vol = rng.standard_normal((7, 96, 96)).astype(np.float32) * 0.1
    vol[:, 20:50, 20:50] += 2.0
    out = seg.parallel_segment(vol, ini_depth=3, nframes=2, num_devices=2)
    assert out.shape == vol.shape
    assert out.dtype == np.uint32
    serial = seg.segment(vol, ini_depth=3, nframes=2, display=False)
    # both paths segment the same bright region (random weights → compare
    # foreground overlap loosely, not label identity)
    if serial.max() > 0 and out.max() > 0:
        inter = np.logical_and(out > 0, serial > 0).sum()
        union = np.logical_or(out > 0, serial > 0).sum()
        assert inter / union > 0.5
