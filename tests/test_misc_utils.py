"""Tests: profiling, progress, importers, text annotation endpoints,
visualization artifact generation."""

import json
import os
import urllib.request

import numpy as np
import pytest

from saber_tpu.utils import zarrlite
from saber_tpu.utils.io import write_mrc
from saber_tpu.utils.profiling import StageTimer, annotate
from saber_tpu.utils.progress import progress_iter


def test_stage_timer():
    timer = StageTimer(sync=False)
    with timer.stage("encode"):
        sum(range(1000))
    with timer.stage("encode"):
        pass
    with timer.stage("decode"):
        pass
    d = timer.as_dict()
    assert d["encode"]["calls"] == 2
    assert "encode" in timer.report()


def test_annotate_scope():
    with annotate("test-span"):
        pass  # no-op without active trace


def test_progress_iter_passthrough():
    assert list(progress_iter(range(5))) == list(range(5))


def test_importers(tmp_path):
    d = tmp_path / "mrcs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        write_mrc(str(d / f"t{i}.mrc"),
                  rng.standard_normal((8, 16, 16)).astype(np.float32),
                  pixel_size=5.0)
    from saber_tpu.utils.importers import run_from_mrcs
    n = run_from_mrcs(str(d), str(tmp_path / "proj.zarr"),
                      output_voxel_size=10.0)
    assert n == 3
    root = zarrlite.Group(str(tmp_path / "proj.zarr"))
    assert len(list(root.keys())) == 3
    vol = np.asarray(root["t0"]["0"])
    assert vol.shape == (4, 8, 8)  # Fourier-rescaled 2x


def test_text_annotation_endpoints(tmp_path, rng):
    p = str(tmp_path / "cand.zarr")
    root = zarrlite.open_group(p, "w")
    g = root.create_group("run_A")
    g.create_dataset("0", data=rng.random((16, 16)).astype(np.float32))
    stack = np.zeros((1, 16, 16), np.uint8)
    stack[0, 2:8, 2:8] = 1
    g.create_group("labels").create_dataset("0", data=stack)

    from saber_tpu.gui.web.server import run_server
    server = run_server(p, port=0, block=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({"run": "run_A", "index": 0,
                           "text": "round #mito near #membrane"}).encode()
        req = urllib.request.Request(
            f"{base}/api/annotate_text", data=body,
            headers={"Content-Type": "application/json"})
        resp = json.load(urllib.request.urlopen(req))
        assert resp["hashtags"] == ["#membrane", "#mito"]
        tags = json.load(urllib.request.urlopen(f"{base}/api/hashtags"))
        assert tags == {"#membrane": 1, "#mito": 1}
        txt = json.load(urllib.request.urlopen(f"{base}/api/text"))
        assert txt["run_A"]["0"]["text"].startswith("round")
    finally:
        server.shutdown()


def test_presence_fit_plot(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from saber_tpu.visualization.sam2 import display_prompt_prediction, plot_fit
    z = np.arange(40)
    data = np.exp(-((z - 20.0) ** 2) / 30)
    plot_fit(data, data, fname="fit.png")
    assert os.path.exists("fit.png")
    img = np.random.default_rng(0).random((32, 32))
    display_prompt_prediction(img, img > 0.5, points=[[5, 5]], labels=[1],
                              box=[2, 2, 20, 20], fname="pp.png")
    assert os.path.exists("pp.png")


def test_frame_scores_anns_and_mask_compare(tmp_path, monkeypatch):
    """Round-5 viz parity: plot_frame_scores R², show_anns composite,
    display_masks two-set compare (reference visualization/sam2.py:5-28,
    131-161; classifier.py:344-383)."""
    monkeypatch.chdir(tmp_path)
    from saber_tpu.visualization.classifier import display_masks
    from saber_tpu.visualization.sam2 import plot_frame_scores, show_anns

    z = np.arange(40)
    data = np.exp(-((z - 20.0) ** 2) / 30)
    r2 = plot_frame_scores(data, data, fname="fs.png")
    assert os.path.exists("fs.png") and r2 == 1.0
    noisy = data + 0.5
    assert plot_frame_scores(data, noisy, fname="fs2.png") < 1.0

    m1 = np.zeros((24, 24), bool); m1[2:10, 2:10] = True
    m2 = np.zeros((24, 24), bool); m2[4:8, 4:8] = True
    anns = [{"segmentation": m2, "area": int(m2.sum())},
            {"segmentation": m1, "area": int(m1.sum())}]
    img = show_anns(anns, borders=True)
    assert img.shape == (24, 24, 4)
    # small mask painted after (over) the large one; borders marked blue
    assert img[5, 5, 3] > 0 and img[2, 2, 3] > 0
    assert show_anns([]) is None

    im = np.random.default_rng(0).random((24, 24))
    out = display_masks(im, np.stack([m1, m2]), masks2=np.stack([m2]),
                        title="compare", fname="cmp.png")
    assert out == "cmp.png" and os.path.exists("cmp.png")


def test_show_masks_per_mask_figures(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from saber_tpu.visualization.sam2 import show_masks
    img = np.random.default_rng(0).random((24, 24))
    m = np.zeros((24, 24), bool); m[4:12, 4:12] = True
    paths = show_masks(img, [m], [0.9], fname_prefix="s")
    assert paths == ["s_0.png"] and os.path.exists("s_0.png")
