"""Tests for the pure-numpy .dm4 / .ser STEM readers (reference
saber/utils/io.py:43-91 reads these via hyperspy).

Fixtures are synthesized by minimal in-test writers that follow the same
public format layout the parser reads, exercising the full tag-tree walk
(nested directories, typed tags, arrays, UTF-16 unit strings).
"""

import struct

import numpy as np
import pytest

from saber_tpu.utils import io as sio
from saber_tpu.utils.stem_io import read_dm4, read_ser


# ---------------------------------------------------------------------------
# synthetic DM4 writer
# ---------------------------------------------------------------------------

_DM_IDS = {np.dtype("int16"): 2, np.dtype("int32"): 3, np.dtype("uint16"): 4,
           np.dtype("uint32"): 5, np.dtype("float32"): 6,
           np.dtype("float64"): 7, np.dtype("uint8"): 8, np.dtype("int8"): 9}


def _dm4_tag(name: str, payload: bytes) -> bytes:
    nb = name.encode()
    return (b"\x15" + struct.pack(">H", len(nb)) + nb
            + struct.pack(">Q", len(payload)) + payload)


def _dm4_dir(name: str, entries: bytes, ntags: int) -> bytes:
    nb = name.encode()
    body = b"\x00\x00" + struct.pack(">Q", ntags) + entries
    return (b"\x14" + struct.pack(">H", len(nb)) + nb
            + struct.pack(">Q", len(body)) + body)


def _dm4_simple(value, dtype) -> bytes:
    tid = _DM_IDS[np.dtype(dtype)]
    data = np.asarray(value, dtype=dtype).tobytes()
    return b"%%%%" + struct.pack(">Q", 1) + struct.pack(">Q", tid) + data


def _dm4_array(arr: np.ndarray) -> bytes:
    tid = _DM_IDS[arr.dtype]
    info = struct.pack(">QQQ", 20, tid, arr.size)
    return b"%%%%" + struct.pack(">Q", 3) + info + arr.tobytes()


def _write_dm4(path, image: np.ndarray, scale: float, units: str,
               thumbnail: np.ndarray | None = None):
    def image_entry(img):
        h, w = img.shape
        dims = (_dm4_tag("0", _dm4_simple(w, np.uint32))
                + _dm4_tag("1", _dm4_simple(h, np.uint32)))
        units_arr = np.frombuffer(units.encode("utf-16-le"), np.uint16)
        dim0 = (_dm4_tag("Scale", _dm4_simple(scale, np.float32))
                + _dm4_tag("Units", _dm4_array(units_arr)))
        cal = _dm4_dir("Dimension", _dm4_dir("0", dim0, 2), 1)
        idata = (_dm4_tag("Data", _dm4_array(np.ascontiguousarray(img)))
                 + _dm4_dir("Dimensions", dims, 2)
                 + _dm4_dir("Calibrations", cal, 1))
        return _dm4_dir("ImageData", idata, 3)

    entries = b""
    n = 0
    if thumbnail is not None:
        entries += _dm4_dir("0", image_entry(thumbnail), 1)
        n += 1
    entries += _dm4_dir(str(n), image_entry(image), 1)
    n += 1

    root_body = b"\x00\x00" + struct.pack(">Q", 1) \
        + _dm4_dir("ImageList", entries, n)
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 4))
        f.write(struct.pack(">Q", len(root_body)))
        f.write(struct.pack(">I", 1))  # little-endian data
        f.write(root_body)


def _write_ser(path, frames: list, delta_m: float):
    """Minimal TIA .ser writer (version 0x0220, 2D elements)."""
    nframes = len(frames)
    with open(path, "wb") as f:
        f.write(struct.pack("<HHH", 0x4949, 0x0197, 0x0220))
        f.write(struct.pack("<iiii", 0x4122, 0x4152, nframes, nframes))
        offset_array_pos = f.tell()
        f.write(struct.pack("<q", 0))  # patched later
        f.write(struct.pack("<i", 1))  # ndim
        f.write(struct.pack("<i", nframes))
        f.write(struct.pack("<dd", 0.0, 1.0))
        f.write(struct.pack("<i", 0))  # desc len
        f.write(struct.pack("<i", 0))  # unit len

        offsets = []
        for img in frames:
            offsets.append(f.tell())
            ny, nx = img.shape
            f.write(struct.pack("<ddiddihii",
                                0.0, delta_m, nx, 0.0, delta_m, ny,
                                6, nx, ny))  # dtype 6 = int32
            f.write(np.ascontiguousarray(img, np.int32).tobytes())
        # offset + tag arrays at the end
        array_pos = f.tell()
        f.write(np.asarray(offsets, "<i8").tobytes())
        f.seek(offset_array_pos)
        f.write(struct.pack("<q", array_pos))


# ---------------------------------------------------------------------------


def test_dm4_roundtrip(tmp_path):
    img = np.arange(12 * 10, dtype=np.float32).reshape(10, 12)
    p = str(tmp_path / "x.dm4")
    _write_dm4(p, img, scale=0.24, units="nm")
    data, pix = read_dm4(p)
    np.testing.assert_array_equal(data, img)
    assert pix == pytest.approx(2.4)  # nm → Å


def test_dm4_skips_thumbnail(tmp_path):
    thumb = np.zeros((4, 4), np.uint8)
    img = np.full((16, 16), 7, np.int16)
    p = str(tmp_path / "t.dm4")
    _write_dm4(p, img, scale=1.5, units="nm", thumbnail=thumb)
    data, _ = read_dm4(p)
    assert data.shape == (16, 16)
    assert data.dtype == np.int16
    np.testing.assert_array_equal(data, img)


def test_dm4_unit_conversions(tmp_path):
    # Reference io.py:83-88 converts µm with 1e3 and pm with 1e-3 — both
    # wrong (1 µm = 1e4 Å, 1 pm = 1e-2 Å); fixed here per repo convention.
    img = np.ones((4, 4), np.float32)
    for units, factor in [("nm", 10.0), ("µm", 1e4), ("pm", 1e-2)]:
        p = str(tmp_path / f"u_{factor}.dm4")
        _write_dm4(p, img, scale=2.0, units=units)
        _, pix = read_dm4(p)
        assert pix == pytest.approx(2.0 * factor), units


def test_read_micrograph_dispatches_dm4(tmp_path):
    img = np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32)
    p = str(tmp_path / "m.dm4")
    _write_dm4(p, img, scale=0.5, units="nm")
    data, pix = sio.read_micrograph(p)
    np.testing.assert_array_equal(data, img)
    assert pix == pytest.approx(5.0)


def test_ser_roundtrip_single(tmp_path):
    img = np.arange(6 * 5, dtype=np.int32).reshape(5, 6)
    p = str(tmp_path / "x.ser")
    _write_ser(p, [img], delta_m=2e-10)
    data, pix = read_ser(p)
    np.testing.assert_array_equal(data, img)
    assert pix == pytest.approx(2.0)  # meters → Å


def test_ser_stack(tmp_path):
    f0 = np.zeros((4, 4), np.int32)
    f1 = np.ones((4, 4), np.int32)
    p = str(tmp_path / "s.ser")
    _write_ser(p, [f0, f1], delta_m=1e-10)
    data, pix = sio.read_micrograph(p)
    assert data.shape == (2, 4, 4)
    np.testing.assert_array_equal(data[1], f1)
    assert pix == pytest.approx(1.0)
