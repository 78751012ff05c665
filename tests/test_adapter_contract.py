"""BaseAdapter contract tests over BOTH adapters (SURVEY.md §4 test
strategy item 2): every ABC method, with the reference's shapes/semantics.
The same suite runs against SAM2Adapter and SAM3Adapter — the reference's
stated design goal ("Mirrors the SAM2Adapter interface so the two can be
swapped", adapters/sam3/predictor.py:44-47)."""

import numpy as np
import pytest

from saber_tpu.adapters.base import BaseAdapter, get_adapter
from saber_tpu.config import AMGConfig, SAM2AdapterConfig, SAM3AdapterConfig


def _make_adapter(kind: str) -> BaseAdapter:
    if kind == "sam2":
        cfg = SAM2AdapterConfig(
            cfg="tiny", image_size=128, dtype="float32", num_maskmem=2,
            amg_cfg=AMGConfig(npoints=4, points_per_batch=8,
                              pred_iou_thresh=0.05,
                              stability_score_thresh=0.0, crop_n_layers=0,
                              use_m2m=False, max_masks=8),
            min_mask_area=10)
    else:
        cfg = SAM3AdapterConfig(cfg="test", image_size=64, dtype="float32",
                                num_maskmem=2, text_prompt="mitochondria",
                                min_mask_area=10)
    return get_adapter(cfg)


@pytest.fixture(scope="module", params=["sam2", "sam3"])
def adapter(request):
    return _make_adapter(request.param)


@pytest.fixture()
def volume(rng):
    vol = rng.standard_normal((6, 80, 80)).astype(np.float32) * 0.1
    vol[:, 25:55, 25:55] += 2.0
    return vol


def test_is_base_adapter(adapter):
    assert isinstance(adapter, BaseAdapter)


def test_segment_image_2d_schema(adapter, rng):
    img = rng.standard_normal((80, 80)).astype(np.float32)
    img[20:60, 20:60] += 2.0
    masks = adapter.segment_image_2d(img)
    assert isinstance(masks, list)
    for m in masks:
        assert m["segmentation"].shape == (80, 80)
        assert m["area"] == int(m["segmentation"].sum())


def test_set_volume_and_state(adapter, volume):
    adapter.set_volume(volume)
    st = adapter.inference_state
    assert st["num_frames"] == 6
    assert st["video_height"] == 80 and st["video_width"] == 80


def test_add_new_mask_and_points(adapter, volume):
    adapter.set_volume(volume)
    mask = np.zeros((80, 80), np.float32)
    mask[25:55, 25:55] = 1
    fidx, obj_ids, _ = adapter.add_new_mask(3, 1, mask)
    assert fidx == 3 and obj_ids == [1]

    fidx, obj_ids, video_mask = adapter.add_new_points_or_box(
        3, 2, points=[[40, 40]], labels=[1])
    assert 2 in obj_ids
    assert video_mask.shape == (1, 80, 80)

    fidx, obj_ids, video_mask = adapter.add_new_points_or_box(
        3, 3, box=[20, 20, 60, 60])
    assert 3 in obj_ids
    adapter.reset_state()
    assert adapter.inference_state["seeds"] == {}


def test_propagate_in_video_iterator(adapter, volume):
    adapter.set_volume(volume)
    mask = np.zeros((80, 80), np.float32)
    mask[25:55, 25:55] = 1
    adapter.add_new_mask(2, 1, mask)
    frames = []
    for fidx, obj_ids, low, painted, scores in adapter.propagate_in_video(
            start_frame_idx=2, max_frame_num_to_track=2):
        frames.append(fidx)
        assert obj_ids == [1]
        assert painted.shape == (80, 80)
    assert frames == [2, 3, 4]  # seed first, then forward window
    adapter.reset_state()


def test_segment_volume_contract(adapter, volume):
    adapter.set_volume(volume)
    mask = np.zeros((80, 80), np.float32)
    mask[25:55, 25:55] = 1
    out = adapter.segment_volume(start_frame_idx=3, masks=[mask],
                                 min_presence_score=0.0)
    assert out.shape == volume.shape
    assert out.dtype == np.uint16
    # frame metrics populated for every slice and object
    assert set(adapter.frame_metrics.keys()) == set(range(6))
    assert 1 in adapter.frame_metrics[0]
    assert "presence_score" in adapter.frame_metrics[0][1]
    adapter.reset_state()


def test_segment_volume_multi_seed_matches_single(adapter, volume):
    """With one seed frame, the batched multi-seed path must reproduce
    segment_volume's output (the degenerate case shares all semantics:
    seeding, bidirectional scan, presence gating)."""
    adapter.set_volume(volume)
    mask = np.zeros((80, 80), np.float32)
    mask[25:55, 25:55] = 1
    single = adapter.segment_volume(start_frame_idx=3, masks=[mask],
                                    min_presence_score=0.0)
    adapter.reset_state()
    multi = adapter.segment_volume_multi_seed({3: [mask]},
                                              min_presence_score=0.0)
    np.testing.assert_array_equal(single, multi)
    assert 1 in adapter.frame_metrics[0]
    adapter.reset_state()


def test_segment_volume_multi_seed_two_frames(adapter, volume):
    """Seeds at two frames propagate in one batched scan and both objects
    appear in the output labels (disjoint masks — overlapping objects
    merge by max like the reference's per-seed np.maximum)."""
    adapter.set_volume(volume)
    m1 = np.zeros((80, 80), np.float32)
    m1[25:55, 25:39] = 1
    m2 = np.zeros((80, 80), np.float32)
    m2[25:55, 41:55] = 1
    out = adapter.segment_volume_multi_seed({1: [m1], 4: [m2]},
                                            min_presence_score=0.0)
    assert out.shape == volume.shape and out.dtype == np.uint16
    assert set(np.unique(out)) <= {0, 1, 2}
    # both seed frames carry segmentation; both objects got metrics
    assert (out[1] > 0).any() and (out[4] > 0).any()
    assert set(adapter.frame_metrics[0]) == {1, 2}
    adapter.reset_state()


def test_segment_volume_empty_masks(adapter, volume):
    adapter.set_volume(volume)
    out = adapter.segment_volume(start_frame_idx=3, masks=[
        np.zeros((80, 80), np.float32)])
    assert out.sum() == 0  # all-zero seed skipped (reference :263-265)


# ---------------------------------------------------------------------------
# SAM3-specific surface (reference adapters/sam3/predictor.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sam3_adapter():
    return _make_adapter("sam3")


def test_sam3_requires_text_prompt(rng):
    adapter = get_adapter(SAM3AdapterConfig(cfg="test", image_size=64,
                                            dtype="float32"))
    with pytest.raises(ValueError, match="text_prompt"):
        adapter.segment_image_2d(rng.standard_normal((32, 32)).astype(np.float32))


def test_sam3_threshold_filters(sam3_adapter, rng):
    img = rng.standard_normal((48, 48)).astype(np.float32)
    none_kept = sam3_adapter.segment_image_2d(img, threshold=1.1)
    assert none_kept == []  # scores are sigmoid-products < 1
    all_kept = sam3_adapter.segment_image_2d(img, threshold=-0.1)
    # fixed candidate capacity: at most num_queries survive min-area
    assert len(all_kept) <= 8
    for m in all_kept:
        assert m["segmentation"].shape == (48, 48)
        assert 0.0 <= m["predicted_iou"] <= 1.0


def test_sam3_normalized_prompts(sam3_adapter, volume):
    sam3_adapter.set_volume(volume)
    fidx, obj_ids, _ = sam3_adapter.add_box_prompt(
        2, 1, [0.25, 0.25, 0.75, 0.75])
    assert fidx == 2 and 1 in obj_ids
    fidx, obj_ids, video_mask = sam3_adapter.add_point_prompt(
        2, 2, np.asarray([[0.5, 0.5]]), np.asarray([1]))
    assert 2 in obj_ids and video_mask.shape == (1, 80, 80)
    sam3_adapter.reset_state()


def test_sam3_presence_is_sigmoid(sam3_adapter):
    scores = np.asarray([[0.0], [10.0], [-10.0]], np.float32)
    p = sam3_adapter._presence_scores(scores)
    np.testing.assert_allclose(p[:, 0], [0.5, 1.0, 0.0], atol=1e-4)
