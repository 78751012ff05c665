"""Analysis-layer tests: statistics oracle vs known geometry, membrane
refinement pipeline on synthetic organelle+membrane volumes."""

import json
import os

import numpy as np
import pytest

from saber_tpu.analysis.organelle_statistics import (
    compute_region_statistics,
    extract_organelle_statistics,
)
from saber_tpu.analysis.refine_membranes import (
    FilteringConfig,
    OrganelleMembraneFilter,
    filter_organelle_membrane_segmentation,
)


class TestStatistics:
    def test_cube_stats(self):
        mask = np.zeros((32, 32, 32), np.uint16)
        mask[4:14, 6:16, 8:18] = 1  # 10³ cube
        stats = compute_region_statistics(mask, voxel_size=10.0)
        assert len(stats) == 1
        s = stats[0]
        assert s["label"] == 1
        np.testing.assert_allclose(s["centroid"], (8.5, 10.5, 12.5), atol=1e-3)
        np.testing.assert_allclose(s["volume_nm3"], 1000.0, rtol=1e-5)
        # cube of side 10: inertia λ = (10²-1)/12 ≈ 8.25 → axis ≈ 2√(5λ) ≈ 12.8
        assert 10 < s["diameter_nm"] < 15

    def test_two_labels_and_tiny_skip(self):
        mask = np.zeros((20, 20, 20), np.uint16)
        mask[2:8, 2:8, 2:8] = 1
        mask[12:18, 12:18, 12:18] = 5
        mask[0, 0, 0] = 9  # < 3 voxels → skipped
        stats = compute_region_statistics(mask)
        assert [s["label"] for s in stats] == [1, 5]

    def test_extract_with_json_fallback(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        mask = np.zeros((16, 16, 16), np.uint16)
        mask[4:12, 4:12, 4:12] = 1

        class Run:
            name = "run_X"

        rows = extract_organelle_statistics(
            Run(), mask, "mito", "sess", "user", voxel_size=10.0)
        assert len(rows) == 1
        assert rows[0][0] == "run_X" and rows[0][1] == 1
        files = [f for f in os.listdir(".") if f.endswith("_picks.json")]
        assert len(files) == 1
        data = json.load(open(files[0]))
        # centroid 7.5 voxels * voxel_size 10, xyz order
        np.testing.assert_allclose(data["points"][0], [75.0, 75.0, 75.0])

    def test_empty(self):
        assert compute_region_statistics(np.zeros((8, 8, 8), np.uint16)) == []


def _make_org_mem(size=48):
    """Synthetic: one organelle blob with a surrounding OPEN membrane shell
    (real membranes have gaps; a closed shell disconnects the combined
    mask's interior from its exterior and — as in the reference — the
    membrane is dropped with the non-largest component)."""
    org = np.zeros((size, size, size), np.uint16)
    mem = np.zeros((size, size, size), np.uint16)
    zz, yy, xx = np.meshgrid(*([np.arange(size)] * 3), indexing="ij")
    c = size // 2
    r = np.sqrt((zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2)
    org[r < 13] = 1
    mem[(r >= 10) & (r < 16)] = 1
    mem[:, :, c:] = 0  # half-open shell → interior connects out the gap
    return org, mem


class TestRefineMembranes:
    def test_pipeline_pairs_labels(self):
        org, mem = _make_org_mem()
        cfg = FilteringConfig(ball_size=1, min_membrane_area=100,
                              edge_trim_z=2, edge_trim_xy=2)
        out = OrganelleMembraneFilter(cfg).run(org, mem)
        assert set(out.keys()) == {"organelles", "membranes"}
        assert out["organelles"].shape == org.shape
        assert out["organelles"].max() >= 1
        # refined organelle stays inside the original
        assert np.all(org[out["organelles"] > 0] > 0)
        # membrane output is geometry-dependent (the largest-component
        # constraint — faithful to the reference — can drop shells whose
        # exterior disconnects from the combined mask); when present, its
        # ids pair with the organelle ids (even/odd scheme)
        if out["membranes"].max() > 0:
            assert out["membranes"].max() == out["organelles"].max()

    def test_no_membrane_gives_empty(self):
        org, _ = _make_org_mem()
        out = filter_organelle_membrane_segmentation(
            org, np.zeros_like(org),
            FilteringConfig(min_membrane_area=10))
        assert out["organelles"].sum() == 0
        assert out["membranes"].sum() == 0

    def test_small_membranes_removed(self):
        org, mem = _make_org_mem()
        speck = np.zeros_like(mem)
        speck[2, 2, 2] = 1  # tiny isolated membrane
        out = OrganelleMembraneFilter(
            FilteringConfig(min_membrane_area=100, edge_trim_z=1,
                            edge_trim_xy=1)).run(org, mem + speck)
        assert out["membranes"][2, 2, 2] == 0
