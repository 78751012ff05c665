"""End-to-end fib/light movie workflows over synthetic TIFF stacks."""

import os

import numpy as np
import pytest

from saber_tpu.config import AMGConfig


def _small_amg():
    return AMGConfig(npoints=4, points_per_batch=8, pred_iou_thresh=0.05,
                     stability_score_thresh=0.0, crop_n_layers=0,
                     use_m2m=False, max_masks=8)


@pytest.fixture()
def tiff_stack(tmp_path, rng):
    import imageio.v2 as imageio
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(5):
        img = (rng.standard_normal((64, 64)) * 10 + 100).astype(np.float32)
        img[20:44, 20:44] += 60
        imageio.imwrite(str(d / f"frame_{i:03d}.tif"), img)
    return str(d / "*.tif")


def test_fib_workflow(tiff_stack, tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    from saber_tpu.entry_points.run_fib_segment import run_fib_segment
    masks = run_fib_segment(tiff_stack, output=str(tmp_path / "fib.npy"),
                            sam2_cfg="tiny", ini_depth=3, nframes=2,
                            min_mask_area=10, image_size=128,
                            amg_cfg=_small_amg(), save_movie=True)
    assert masks.shape == (5, 64, 64)
    assert masks.dtype == np.uint32
    assert os.path.exists(tmp_path / "fib.npy")
    assert os.path.exists(tmp_path / "fib.gif")


def test_light_workflow(tiff_stack, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from saber_tpu.entry_points.run_light_segment import run_light_segment
    masks = run_light_segment(tiff_stack, output=str(tmp_path / "light.npy"),
                              sam2_cfg="tiny", ini_depth=3, nframes=2,
                              min_mask_area=10, image_size=128,
                              amg_cfg=_small_amg(), save_movie=False)
    assert masks.shape == (5, 64, 64)
    assert os.path.exists(tmp_path / "light.npy")
