"""CLI + workflow tests: command tree, batch tomogram/micrograph
workflows over synthetic MRC inputs, web annotation server round trip,
classifier prep/label/split pipeline."""

import json
import os
import urllib.request

import numpy as np
import pytest
from click.testing import CliRunner

from saber_tpu.utils import zarrlite
from saber_tpu.utils.io import write_mrc


@pytest.fixture(scope="module")
def cli():
    from saber_tpu.main import routines
    return routines


def test_command_tree(cli):
    runner = CliRunner()
    out = runner.invoke(cli, ["--help"])
    assert out.exit_code == 0
    for grp in ("segment", "classifier", "analysis", "save", "web", "slurm"):
        assert grp in out.output
    out = runner.invoke(cli, ["segment", "--help"])
    for cmd in ("tomograms", "micrographs", "slab", "fib", "light"):
        assert cmd in out.output
    out = runner.invoke(cli, ["classifier", "--help"])
    for cmd in ("train", "predict", "evaluate", "prep2d", "prep3d", "split",
                "label", "info"):
        assert cmd in out.output


def test_slurm_script_generation(cli, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    runner = CliRunner()
    out = runner.invoke(cli, ["slurm", "tomograms", "--input", "/data/t",
                              "--shell-name", "sub.sh"])
    assert out.exit_code == 0, out.output
    script = open("sub.sh").read()
    assert "saber segment tomograms" in script
    assert "--input /data/t" in script
    assert "#SBATCH" in script


@pytest.fixture()
def mrc_dir(tmp_path, rng):
    d = tmp_path / "tomos"
    d.mkdir()
    for i in range(2):
        vol = rng.standard_normal((8, 64, 64)).astype(np.float32) * 0.1
        vol[:, 20:40, 20:40] += 2.0
        write_mrc(str(d / f"tomo_{i}.mrc"), vol, pixel_size=10.0)
    return str(d)


def test_tomogram_batch_workflow(mrc_dir, tmp_path, monkeypatch):
    """End-to-end `segment tomograms` over 2 synthetic runs."""
    monkeypatch.chdir(tmp_path)
    from saber_tpu.entry_points.run_tomogram_segment import run_tomo_seg
    import saber_tpu.segmenters.loaders as loaders
    from saber_tpu.config import AMGConfig

    # shrink the model for CPU testing
    orig = loaders._adapter_cfg

    def small_cfg(sam2_cfg, classifier, min_mask_area, image_size=1024,
                  text_prompt=None):
        cfg = orig(sam2_cfg, classifier, min_mask_area, image_size=128)
        cfg.amg_cfg = AMGConfig(npoints=4, points_per_batch=8,
                                pred_iou_thresh=0.05,
                                stability_score_thresh=0.0,
                                crop_n_layers=0, use_m2m=False, max_masks=8)
        cfg.cfg = "tiny"
        cfg.dtype = "float32"
        return cfg

    monkeypatch.setattr(loaders, "_adapter_cfg", small_cfg)
    out = run_tomo_seg(mrc_dir, output=str(tmp_path / "segs.zarr"),
                       slab_thickness=2, num_devices=1, gallery=True)
    assert out["summary"]["total"] == 2
    assert out["summary"]["failed"] == 0, out["results"]
    root = zarrlite.Group(str(tmp_path / "segs.zarr"))
    runs = list(root.keys())
    assert len(runs) == 2
    # gallery pages written
    gallery_dir = str(tmp_path / "segs_gallery")
    assert os.path.isdir(gallery_dir) and os.listdir(gallery_dir)
    # metadata audit log
    assert os.path.exists(str(tmp_path / "segs_metadata.yaml"))


def test_micrograph_batch_workflow(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    d = tmp_path / "micros"
    d.mkdir()
    for i in range(2):
        img = rng.standard_normal((64, 64)).astype(np.float32) * 0.1
        img[16:48, 16:48] += 2.0
        write_mrc(str(d / f"m_{i}.mrc"), img, pixel_size=4.0)

    import saber_tpu.segmenters.loaders as loaders
    from saber_tpu.config import AMGConfig
    orig = loaders._adapter_cfg

    def small_cfg(sam2_cfg, classifier, min_mask_area, image_size=1024,
                  text_prompt=None):
        cfg = orig(sam2_cfg, classifier, min_mask_area, image_size=128)
        cfg.amg_cfg = AMGConfig(npoints=4, points_per_batch=8,
                                pred_iou_thresh=0.05,
                                stability_score_thresh=0.0,
                                crop_n_layers=0, use_m2m=False, max_masks=8)
        cfg.cfg = "tiny"
        cfg.dtype = "float32"
        return cfg

    monkeypatch.setattr(loaders, "_adapter_cfg", small_cfg)
    from saber_tpu.entry_points.run_micrograph_segment import run_micrograph_segment
    out = run_micrograph_segment(str(d), output=str(tmp_path / "micro.zarr"),
                                 num_devices=1, min_mask_area=10)
    assert out["summary"]["failed"] == 0, out["results"]
    root = zarrlite.Group(str(tmp_path / "micro.zarr"))
    assert len(list(root.keys())) == 2


class TestWebServer:
    @pytest.fixture()
    def ann_zarr(self, tmp_path, rng):
        p = str(tmp_path / "cand.zarr")
        root = zarrlite.open_group(p, "w")
        root.attrs["labels"] = {"1": "mito"}
        g = root.create_group("run_A")
        g.create_dataset("0", data=rng.random((32, 32)).astype(np.float32))
        stack = np.zeros((2, 32, 32), np.uint8)
        stack[0, 4:12, 4:12] = 1
        stack[1, 20:30, 20:30] = 1
        g.create_group("labels").create_dataset("0", data=stack)
        return p

    def test_rest_roundtrip(self, ann_zarr):
        from saber_tpu.gui.web.server import run_server
        server = run_server(ann_zarr, port=0, block=False)
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        try:
            runs = json.load(urllib.request.urlopen(f"{base}/api/runs"))
            assert runs["runs"] == ["run_A"]
            payload = json.load(urllib.request.urlopen(f"{base}/api/run/run_A"))
            assert len(payload["masks"]) == 2
            assert payload["masks"][0]["area"] == 64
            assert payload["image"]  # base64 png
            classes = json.load(urllib.request.urlopen(f"{base}/api/classes"))
            assert classes == {"1": "mito"}

            body = json.dumps({"run": "run_A", "accepted": {"1": [0]},
                               "rejected": [1]}).encode()
            req = urllib.request.Request(
                f"{base}/api/annotate", data=body,
                headers={"Content-Type": "application/json"})
            resp = json.load(urllib.request.urlopen(req))
            assert resp["ok"]

            # progress reflects the annotation just posted
            prog = json.load(urllib.request.urlopen(f"{base}/api/progress"))
            assert prog == {"runs_annotated": 1, "runs_total": 1,
                            "per_class": {"1": 1}, "rejected": 1}

            # index page serves
            html = urllib.request.urlopen(base + "/").read().decode()
            assert "saber-tpu annotator" in html
        finally:
            server.shutdown()

        ann_file = os.path.splitext(ann_zarr)[0] + "_annotations.json"
        saved = json.load(open(ann_file))
        assert saved["run_A"]["accepted"]["1"] == [0]

    def test_3d_slice_review_and_overlay(self, tmp_path, rng):
        """z-slider scroll-through of a 3D stack with per-label overlays
        (reference gui/base/annotation_viewer_3d.py behaviors)."""
        p = str(tmp_path / "vol.zarr")
        root = zarrlite.open_group(p, "w")
        g = root.create_group("tomo_A")
        g.create_dataset("0", data=rng.random((6, 24, 24)).astype(np.float32))
        labels = np.zeros((6, 24, 24), np.uint8)
        labels[1:4, 2:10, 2:10] = 1     # object 1 spans z 1-3
        labels[4:6, 12:20, 12:20] = 2   # object 2 spans z 4-5
        g.create_group("labels").create_dataset("0", data=labels)

        from saber_tpu.gui.web.server import run_server
        server = run_server(p, port=0, block=False)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            payload = json.load(urllib.request.urlopen(f"{base}/api/run/tomo_A"))
            assert payload["nz"] == 6 and payload["z"] == 3
            # label-map semantics: mask index == label id
            assert [m["index"] for m in payload["masks"]] == [1, 2]
            # z=2 shows object 1 only; z=5 shows object 2 only
            s2 = json.load(urllib.request.urlopen(
                f"{base}/api/run/tomo_A/slice/2"))
            s5 = json.load(urllib.request.urlopen(
                f"{base}/api/run/tomo_A/slice/5"))
            assert s2["z"] == 2 and s5["z"] == 5
            assert s2["overlay"] and s5["overlay"]
            assert s2["overlay"] != s5["overlay"]
            # out-of-range z clamps instead of erroring
            s99 = json.load(urllib.request.urlopen(
                f"{base}/api/run/tomo_A/slice/99"))
            assert s99["z"] == 5
        finally:
            server.shutdown()

    def test_multi_class_accept_roundtrip(self, ann_zarr):
        """Per-class accept sets persist independently (reference
        multi_class_segmentation_picker.py behavior)."""
        from saber_tpu.gui.web.server import run_server
        server = run_server(ann_zarr, port=0, block=False)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            body = json.dumps({"run": "run_A",
                               "accepted": {"1": [0], "2": [1]},
                               "rejected": []}).encode()
            req = urllib.request.Request(
                f"{base}/api/annotate", data=body,
                headers={"Content-Type": "application/json"})
            assert json.load(urllib.request.urlopen(req))["ok"]
            ann = json.load(urllib.request.urlopen(f"{base}/api/annotations"))
            assert ann["run_A"]["accepted"] == {"1": [0], "2": [1]}
            # 2D payload still exposes an overlay built from the mask stack
            payload = json.load(urllib.request.urlopen(f"{base}/api/run/run_A"))
            assert payload["nz"] == 1 and payload.get("overlay")
        finally:
            server.shutdown()

    def test_labeler_consumes_annotations(self, ann_zarr, tmp_path):
        ann = {"run_A": {"accepted": {"1": [0]}, "rejected": [1]}}
        ann_path = str(tmp_path / "ann.json")
        json.dump(ann, open(ann_path, "w"))
        from saber_tpu.classifier.preprocess.apply_labels import labeler
        out = labeler(ann_zarr, ann_path, str(tmp_path / "labeled.zarr"))
        root = zarrlite.Group(out)
        assert "run_A" in root
        lab = root["run_A"]["labels"]
        assert "0" in lab          # class 1 → stack "0"
        assert "rejected" in lab
        assert np.asarray(lab["0"]).sum() == 64


def test_split_and_info(tmp_path, rng):
    p = str(tmp_path / "data.zarr")
    root = zarrlite.open_group(p, "w")
    root.attrs["labels"] = {"1": "x"}
    for i in range(10):
        g = root.create_group(f"run_{i}")
        g.create_dataset("0", data=rng.random((8, 8)).astype(np.float32))
        g.create_group("labels").create_dataset(
            "0", data=(rng.random((8, 8)) > 0.5).astype(np.uint8))
    from saber_tpu.classifier.preprocess.split_merge_data import split_dataset
    train, val, test = split_dataset(p, 0.6, 0.2, seed=0)
    nt = len(list(zarrlite.Group(train).keys()))
    nv = len(list(zarrlite.Group(val).keys()))
    ns = len(list(zarrlite.Group(test).keys()))
    assert (nt, nv, ns) == (6, 2, 2)
    from saber_tpu.classifier.preprocess.training_data_info import training_data_info
    info = training_data_info(train)
    assert info["runs"] == 6


def test_save_statistics_and_coordinates(tmp_path, monkeypatch, rng):
    """`saber save statistics/coordinates` over a labeled zarr."""
    monkeypatch.chdir(tmp_path)
    root = zarrlite.open_group(str(tmp_path / "seg.zarr"), "w")
    g = root.create_group("run_A")
    g.create_dataset("0", data=rng.random((8, 24, 24)).astype(np.float32))
    lab = np.zeros((8, 24, 24), np.uint8)
    lab[2:6, 6:16, 6:16] = 1
    g.create_group("labels").create_dataset("0", data=lab)

    from saber_tpu.main import routines
    runner = CliRunner()
    out = runner.invoke(routines, ["save", "statistics",
                                   "--input", str(tmp_path / "seg.zarr"),
                                   "--output-csv", "st.csv"])
    assert out.exit_code == 0, out.output
    rows = open("st.csv").read().strip().splitlines()
    assert len(rows) == 2 and rows[1].startswith("run_A,1,")

    out = runner.invoke(routines, ["save", "coordinates",
                                   "--input", str(tmp_path / "seg.zarr")])
    assert out.exit_code == 0, out.output
    picks = [f for f in os.listdir(".") if f.endswith("_picks.json")]
    assert picks, "no pick sidecars written"


class TestDualViewEndpoints:
    """Dual-view picker REST surface (reference segmentation_picker.py):
    pixel picking with overlap hits + the accepted-only overlay pane."""

    @pytest.fixture()
    def overlap_zarr(self, tmp_path, rng):
        p = str(tmp_path / "ov.zarr")
        root = zarrlite.open_group(p, "w")
        g = root.create_group("run_A")
        g.create_dataset("0", data=rng.random((32, 32)).astype(np.float32))
        stack = np.zeros((2, 32, 32), np.uint8)
        stack[0, 4:20, 4:20] = 1
        stack[1, 10:28, 10:28] = 1      # overlaps mask 0 in [10:20)
        g.create_group("labels").create_dataset("0", data=stack)
        return p

    def test_pick_overlap_hits_and_bounds(self, overlap_zarr):
        from saber_tpu.gui.web.server import run_server
        server = run_server(overlap_zarr, port=0, block=False)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            h = json.load(urllib.request.urlopen(
                f"{base}/api/run/run_A/pick?y=15&x=15"))
            assert h["hits"] == [0, 1]          # overlap → both, in order
            h0 = json.load(urllib.request.urlopen(
                f"{base}/api/run/run_A/pick?y=5&x=5"))
            assert h0["hits"] == [0]
            empty = json.load(urllib.request.urlopen(
                f"{base}/api/run/run_A/pick?y=0&x=31"))
            assert empty["hits"] == []
            oob = json.load(urllib.request.urlopen(
                f"{base}/api/run/run_A/pick?y=99&x=0"))
            assert oob["hits"] == []
        finally:
            server.shutdown()

    def test_accepted_overlay_colors_by_class(self, overlap_zarr):
        import base64 as b64mod
        import io as iomod

        import imageio.v2 as imageio

        from saber_tpu.gui.web.server import _TAB10, run_server
        server = run_server(overlap_zarr, port=0, block=False)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            body = json.dumps({"run": "run_A",
                               "accepted": {"2": [0]}, "z": 0}).encode()
            req = urllib.request.Request(
                f"{base}/api/accepted_overlay", data=body,
                headers={"Content-Type": "application/json"})
            r = json.load(urllib.request.urlopen(req))
            png = imageio.imread(iomod.BytesIO(
                b64mod.b64decode(r["overlay"])))
            # mask 0 pixels NOT covered by mask 1 (composite label wins)
            # get class 2's color; everything else transparent
            assert tuple(png[5, 5, :3]) == tuple(_TAB10[1])
            assert png[5, 5, 3] == 255
            assert png[25, 25, 3] == 0          # mask 1 not accepted
            assert png[0, 0, 3] == 0            # background
        finally:
            server.shutdown()

    def test_pick_3d_label_map(self, tmp_path, rng):
        from saber_tpu.gui.web.server import run_server
        p = str(tmp_path / "vol.zarr")
        root = zarrlite.open_group(p, "w")
        g = root.create_group("tomo")
        g.create_dataset("0", data=rng.random((4, 16, 16)).astype(np.float32))
        labels = np.zeros((4, 16, 16), np.uint8)
        labels[2, 3:9, 3:9] = 5
        g.create_group("labels").create_dataset("0", data=labels)
        server = run_server(p, port=0, block=False)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            h = json.load(urllib.request.urlopen(
                f"{base}/api/run/tomo/pick?y=5&x=5&z=2"))
            assert h["hits"] == [5]             # label value at the voxel
            h0 = json.load(urllib.request.urlopen(
                f"{base}/api/run/tomo/pick?y=5&x=5&z=0"))
            assert h0["hits"] == []
        finally:
            server.shutdown()


def test_new_round5_verbs(cli, tmp_path, monkeypatch):
    """Round-5 verb-parity sweep additions: weight downloads exposed as
    CLI verbs (reference pretrained_weights.py:10-18), classifier prep
    slurm verbs (reference classifier/preprocess/slurm.py), and a WORKING
    refine-membranes slurm verb (the reference's is an empty stub,
    entry_points/slurm.py:83-89)."""
    monkeypatch.chdir(tmp_path)
    runner = CliRunner()
    out = runner.invoke(cli, ["--help"])
    assert "sam2-weights" in out.output and "sam3-weights" in out.output
    # offline: the verb must succeed and report unavailability, not crash
    monkeypatch.setenv("SABER_CHECKPOINT_DIR", str(tmp_path / "ckpts"))
    import socket

    def _no_net(*a, **k):
        raise OSError("no egress")
    monkeypatch.setattr(socket, "getaddrinfo", _no_net)
    out = runner.invoke(cli, ["sam2-weights", "--cfg", "tiny"])
    assert out.exit_code == 0 and "tiny" in out.output

    out = runner.invoke(cli, ["classifier", "prep2d-slurm", "--input",
                              "/data/m", "--shell-name", "p2.sh"])
    assert out.exit_code == 0, out.output
    assert "saber classifier prep2d" in open("p2.sh").read()
    out = runner.invoke(cli, ["classifier", "prep3d-slurm", "--input",
                              "/data/t", "--voxel-size", "10",
                              "--shell-name", "p3.sh"])
    assert out.exit_code == 0, out.output
    s = open("p3.sh").read()
    assert "saber classifier prep3d" in s and "--voxel-size 10" in s
    out = runner.invoke(cli, ["slurm", "refine-membranes", "--organelles",
                              "/data/o.zarr", "--membranes", "/data/m.zarr",
                              "--shell-name", "rm.sh"])
    assert out.exit_code == 0, out.output
    s = open("rm.sh").read()
    assert "saber analysis refine-membranes" in s and "#SBATCH" in s


def test_round5_verb_edge_cases(cli, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    runner = CliRunner()
    # unknown cfg -> clean CLI error, not a traceback
    out = runner.invoke(cli, ["sam2-weights", "--cfg", "medium"])
    assert out.exit_code != 0 and "unknown SAM2 config" in out.output
    assert "Traceback" not in out.output
    # paths with spaces survive into the sbatch script
    out = runner.invoke(cli, ["classifier", "prep2d-slurm", "--input",
                              "/data/my data.zarr", "--shell-name", "q.sh"])
    assert out.exit_code == 0, out.output
    assert "'/data/my data.zarr'" in open("q.sh").read()
