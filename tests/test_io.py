"""I/O layer tests: zarrlite round trips, MRC round trips, writers."""

import os

import numpy as np
import pytest

from saber_tpu.utils import zarrlite
from saber_tpu.utils.io import read_micrograph, read_mrc, write_mrc
from saber_tpu.utils.zarr_writer import ParallelZarrWriter, get_zarr_writer


class TestZarrlite:
    def test_array_roundtrip(self, tmp_path, rng):
        data = rng.standard_normal((37, 53)).astype(np.float32)
        arr = zarrlite.Array.create(str(tmp_path / "a"), data.shape, chunks=(16, 16))
        arr[:, :] = data
        back = zarrlite.Array(str(tmp_path / "a"))
        np.testing.assert_array_equal(back[:, :], data)
        np.testing.assert_array_equal(back[5], data[5])
        np.testing.assert_array_equal(back[3:9, 10:20], data[3:9, 10:20])

    def test_partial_write(self, tmp_path):
        arr = zarrlite.Array.create(str(tmp_path / "a"), (10, 10),
                                    chunks=(4, 4), dtype=np.int32)
        arr[2:5, 2:5] = 7
        out = arr[:, :]
        assert out[3, 3] == 7 and out[0, 0] == 0

    def test_group_tree(self, tmp_path, rng):
        root = zarrlite.open_group(str(tmp_path / "g"), mode="w")
        run = root.create_group("run_001")
        img = rng.random((8, 8)).astype(np.float32)
        run.create_dataset("0", data=img)
        labels = run.create_group("labels")
        labels.create_dataset("0", data=(img > 0.5).astype(np.uint8))
        root.attrs["labels"] = {"1": "mito"}

        re = zarrlite.open_group(str(tmp_path / "g"), mode="r")
        assert "run_001" in re
        np.testing.assert_array_equal(re["run_001"]["0"][:, :], img)
        assert re.attrs["labels"] == {"1": "mito"}
        assert list(re.keys()) == ["run_001"]

    def test_bool_and_uint16(self, tmp_path):
        a = zarrlite.Array.create(str(tmp_path / "b"), (4,), dtype=np.uint16)
        a[:] = np.array([1, 2, 3, 65535], np.uint16)
        assert zarrlite.Array(str(tmp_path / "b"))[:].tolist() == [1, 2, 3, 65535]


class TestMRC:
    def test_roundtrip(self, tmp_path, rng):
        vol = rng.standard_normal((5, 12, 16)).astype(np.float32)
        p = str(tmp_path / "t.mrc")
        write_mrc(p, vol, pixel_size=7.5)
        back, pix = read_mrc(p)
        np.testing.assert_array_equal(back, vol)
        assert abs(pix - 7.5) < 1e-5

    def test_2d_micrograph(self, tmp_path, rng):
        img = rng.standard_normal((24, 32)).astype(np.float32)
        p = str(tmp_path / "m.mrc")
        write_mrc(p, img, pixel_size=2.0)
        back, pix = read_micrograph(p)
        assert back.shape == (24, 32)
        np.testing.assert_array_equal(back, img)

    def test_int16_mode(self, tmp_path):
        vol = np.arange(60, dtype=np.int16).reshape(3, 4, 5)
        p = str(tmp_path / "i.mrc")
        write_mrc(p, vol)
        back, _ = read_mrc(p)
        np.testing.assert_array_equal(back, vol)


class TestWriter:
    def test_write_run(self, tmp_path, rng):
        w = ParallelZarrWriter(str(tmp_path / "out.zarr"))
        img = rng.random((16, 16)).astype(np.float32)
        masks = (rng.random((3, 16, 16)) > 0.5).astype(np.uint8)
        w.write("run_A", img, masks, pixel_size=10.0)
        w.add_attributes({"amg": {"npoints": 32}})

        root = zarrlite.open_group(str(tmp_path / "out.zarr"), "r")
        np.testing.assert_allclose(root["run_A"]["0"][:, :], img)
        np.testing.assert_array_equal(root["run_A"]["labels"]["0"][:, :, :], masks)
        assert root["run_A"].attrs["multiscales"][0]["version"] == "0.4"
        assert root.attrs["amg"]["npoints"] == 32

    def test_singleton(self, tmp_path):
        p = str(tmp_path / "w.zarr")
        assert get_zarr_writer(p) is get_zarr_writer(p)

    def test_concurrent_writes(self, tmp_path, rng):
        import threading
        w = ParallelZarrWriter(str(tmp_path / "c.zarr"))
        imgs = {f"r{i}": rng.random((8, 8)).astype(np.float32) for i in range(8)}

        def work(name):
            w.write(name, imgs[name], (imgs[name] > 0.5).astype(np.uint8))

        threads = [threading.Thread(target=work, args=(n,)) for n in imgs]
        [t.start() for t in threads]
        [t.join() for t in threads]
        root = zarrlite.open_group(str(tmp_path / "c.zarr"), "r")
        assert len(list(root.keys())) == 8
        assert w.num_runs == 8
        for n, img in imgs.items():
            np.testing.assert_allclose(root[n]["0"][:, :], img)
