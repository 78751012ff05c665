"""Tests for mask algebra (saber_tpu.ops.masks) and connected components."""

import numpy as np
import pytest
from scipy import ndimage as ndi

from saber_tpu.ops import masks as mk
from saber_tpu.ops.connected import label, label_device_2d, separate_masks
from saber_tpu.ops.thickness import fit_organelle_boundaries


def _mk_mask(shape, sl):
    m = np.zeros(shape, bool)
    m[sl] = True
    return m


def _mask_dict(seg, stability=0.9):
    return {"segmentation": seg, "area": int(seg.sum()), "stability_score": stability}


class TestIoUMatrix:
    def test_matches_pairwise(self, rng):
        masks = rng.random((6, 32, 32)) > 0.6
        got = np.asarray(mk.mask_iou_matrix(masks))
        for i in range(6):
            for j in range(6):
                inter = np.logical_and(masks[i], masks[j]).sum()
                union = np.logical_or(masks[i], masks[j]).sum()
                want = inter / union if union else 0.0
                np.testing.assert_allclose(got[i, j], want, rtol=1e-5)


class TestRemoveDuplicates:
    def test_keeps_highest_stability(self):
        shape = (40, 40)
        a = _mk_mask(shape, (slice(5, 20), slice(5, 20)))
        b = a.copy()  # exact duplicate
        c = _mk_mask(shape, (slice(25, 38), slice(25, 38)))
        masks = [_mask_dict(a, 0.5), _mask_dict(b, 0.95), _mask_dict(c, 0.7)]
        out = mk.remove_duplicate_masks(masks)
        assert len(out) == 2
        stabs = sorted(m["stability_score"] for m in out)
        assert stabs == [0.7, 0.95]

    def test_non_duplicates_kept(self):
        shape = (40, 40)
        a = _mk_mask(shape, (slice(0, 10), slice(0, 10)))
        c = _mk_mask(shape, (slice(20, 30), slice(20, 30)))
        out = mk.remove_duplicate_masks([_mask_dict(a), _mask_dict(c)])
        assert len(out) == 2


class TestPredictionRouting:
    def test_instance_filtering_consensus(self):
        shape = (50, 50)
        m1 = _mk_mask(shape, (slice(0, 10), slice(0, 10)))       # class 1
        m2 = _mk_mask(shape, (slice(5, 15), slice(5, 15)))       # class 1, overlaps m1
        m3 = _mk_mask(shape, (slice(30, 45), slice(30, 45)))     # class 2
        preds = np.array([[0.1, 0.8, 0.1], [0.1, 0.7, 0.2], [0.1, 0.2, 0.7]])
        out = mk.convert_predictions_to_masks(
            preds, [_mask_dict(m) for m in (m1, m2, m3)], desired_class=1, min_mask_area=10)
        # m1|m2 merge into one consensus component; m3 excluded (class 2)
        assert len(out) == 1
        np.testing.assert_array_equal(out[0]["segmentation"], m1 | m2)
        assert 0.7 <= out[0]["predicted_iou"] <= 0.8

    def test_semantic_merge(self):
        shape = (30, 30)
        m1 = _mk_mask(shape, (slice(0, 5), slice(0, 5)))
        m2 = _mk_mask(shape, (slice(10, 15), slice(0, 5)))
        m3 = _mk_mask(shape, (slice(20, 25), slice(0, 5)))
        preds = np.array([[0.1, 0.8, 0.1], [0.1, 0.7, 0.2], [0.1, 0.2, 0.7]])
        out = mk.convert_predictions_to_masks(
            preds, [_mask_dict(m) for m in (m1, m2, m3)], desired_class=0)
        assert len(out) == 2  # classes 1 and 2
        np.testing.assert_array_equal(out[0]["segmentation"], m1 | m2)
        np.testing.assert_array_equal(out[1]["segmentation"], m3)
        assert out[0]["area"] == int(m1.sum() + m2.sum())


class TestArrayConversions:
    def test_masks_to_array_roundtrip(self):
        shape = (20, 20)
        m1 = _mk_mask(shape, (slice(0, 5), slice(0, 5)))
        m2 = _mk_mask(shape, (slice(10, 15), slice(10, 15)))
        arr = mk.masks_to_array([_mask_dict(m1), _mask_dict(m2)])
        assert arr.shape == (2, 20, 20)
        assert arr.dtype == np.uint8
        assert arr[0].max() == 1 and arr[1].max() == 2

    def test_masks_to_array_empty(self):
        assert mk.masks_to_array([]).size == 0
        assert mk.masks_to_array("nope") is None

    def test_masks_to_list(self):
        labels = np.zeros((10, 10), np.uint8)
        labels[:3, :3] = 1
        labels[5:, 5:] = 2
        out = mk.masks_to_list(labels)
        assert len(out) == 3  # 0, 1, 2


class TestConnectedComponents:
    def test_label_matches_scipy_2d(self, rng):
        m = rng.random((64, 64)) > 0.7
        got, ngot = label(m, connectivity=2)
        structure = ndi.generate_binary_structure(2, 2)
        want, nwant = ndi.label(m, structure=structure)
        assert ngot == nwant
        # same partition up to label permutation
        for lbl in range(1, ngot + 1):
            comp = got == lbl
            vals = np.unique(want[comp])
            assert len(vals) == 1

    def test_separate_masks(self):
        vol = np.zeros((10, 40, 40), bool)
        vol[2:8, 2:12, 2:12] = True        # 600 voxels
        vol[2:8, 25:35, 25:35] = True      # 600 voxels
        vol[0, 0, 0] = True                # tiny speck → removed
        out = separate_masks(vol, min_mask_area=10)  # min_vol = 100
        assert out.dtype == np.uint32
        assert set(np.unique(out)) == {0, 1, 2}

    def test_separate_masks_empty(self):
        out = separate_masks(np.zeros((4, 4, 4), bool))
        assert out.sum() == 0

    def test_label_device_2d(self):
        m = np.zeros((32, 32), bool)
        m[2:10, 2:10] = True
        m[20:30, 20:30] = True
        lab = np.asarray(label_device_2d(m, num_iters=32))
        assert lab[0, 0] == 0
        ids = np.unique(lab[lab > 0])
        assert len(ids) == 2
        assert len(np.unique(lab[2:10, 2:10])) == 1


class TestFeathering:
    def test_fast_3d_gaussian_smoothing_keeps_labels(self):
        vol = np.zeros((16, 32, 32), np.uint8)
        vol[4:12, 4:14, 4:14] = 1
        vol[4:12, 18:28, 18:28] = 2
        out = mk.fast_3d_gaussian_smoothing(vol, scale=0.05)
        assert out.dtype == np.uint8
        assert set(np.unique(out)) <= {0, 1, 2}
        # cores survive smoothing
        assert out[8, 8, 8] == 1
        assert out[8, 23, 23] == 2

    def test_empty_volume(self):
        out = mk.fast_3d_gaussian_smoothing(np.zeros((8, 8, 8), np.uint8))
        assert out.sum() == 0


class TestThicknessFitting:
    def test_gaussian_curve_recovered(self):
        z = np.arange(60, dtype=np.float32)
        true = 5.0 * np.exp(-((z - 30) ** 2) / (2 * 4.0**2))
        scores = np.stack([true, true * 0.5], axis=1)
        fit = fit_organelle_boundaries(scores)
        assert fit.shape == scores.shape
        # fitted curve peaks near z=30 and correlates strongly
        for ii in range(2):
            peak = np.argmax(fit[:, ii])
            assert abs(int(peak) - 30) <= 3
            c = np.corrcoef(fit[:, ii], scores[:, ii])[0, 1]
            assert c > 0.95

    def test_flat_scores_give_zero(self):
        scores = np.zeros((40, 3), np.float32)
        fit = fit_organelle_boundaries(scores)
        np.testing.assert_allclose(fit, 0.0, atol=1e-5)

    def test_empty(self):
        out = fit_organelle_boundaries(np.zeros((40, 0), np.float32))
        assert out.shape == (40, 0)
