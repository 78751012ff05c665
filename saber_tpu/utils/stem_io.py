"""Pure-numpy STEM readers: Gatan DigitalMicrograph .dm4 and TIA .ser.

The reference reads these via hyperspy (saber/utils/io.py:43-91), which is
not installed here; both formats are simple enough to parse directly.

DM4 layout (public format, as documented by the ncempy/hyperspy projects):
a big-endian tag tree — 4-byte version(=4), 8-byte root length, 4-byte
byte-order flag (1 = little-endian tag *data*), then a root tag directory.
Each directory entry is [type byte: 0x14 dir / 0x15 tag; 2-byte name len;
name; 8-byte block length]; a tag's payload is "%%%%", an 8-byte count,
that many 8-byte big-endian "info" words (type descriptor), then the raw
data. The image lives at ImageList/<i>/ImageData/{Data,Dimensions} with
per-axis Calibrations/Dimension/<i>/{Scale,Units}.

SER layout: little-endian header (byteorder 0x4949, series id 0x0197),
element offsets array, then per-element 2D records with X/Y calibration
(meters) and a typed pixel array.

Unit conversion to Angstroms fixes two reference bugs (io.py:83-88):
µm→Å is 1e4 (reference: 1e3) and pm→Å is 1e-2 (reference: 1e-3).
"""

import struct
from typing import Any, Dict, Optional, Tuple

import numpy as np

# DM simple-type id → numpy dtype (data section is little-endian when the
# header byte-order flag is 1, which is the only case produced by GMS).
_DM_SIMPLE = {2: "i2", 3: "i4", 4: "u2", 5: "u4", 6: "f4", 7: "f8",
              8: "u1", 9: "i1", 10: "i1", 11: "i8", 12: "u8"}
_DM_SIZES = {2: 2, 3: 4, 4: 2, 5: 4, 6: 4, 7: 8, 8: 1, 9: 1, 10: 1,
             11: 8, 12: 8}

_TO_ANGSTROM = {
    "nm": 10.0,
    "um": 1e4,      # reference io.py:85 uses 1e3 — wrong; 1 µm = 1e4 Å
    "µm": 1e4,
    "μm": 1e4,
    "pm": 1e-2,     # reference io.py:87 uses 1e-3 — wrong; 1 pm = 0.01 Å
    "a": 1.0,
    "Å": 1.0,
    "angstrom": 1.0,
}


def _unit_to_angstrom(scale: float, units: str) -> Optional[float]:
    factor = _TO_ANGSTROM.get(units.strip().lower() or "nm")
    if factor is None:
        factor = _TO_ANGSTROM.get(units.strip())
    return scale * factor if factor is not None else None


class _DM4Reader:
    """Single-pass DM4 tag-tree parser producing a nested dict."""

    def __init__(self, f):
        self.f = f
        version = struct.unpack(">I", f.read(4))[0]
        if version != 4:
            raise ValueError(f"not a DM4 file (version={version})")
        struct.unpack(">Q", f.read(8))  # root length, unused
        self.little = struct.unpack(">I", f.read(4))[0] == 1

    def read_root(self) -> Dict[str, Any]:
        return self._read_dir()

    def _read_dir(self) -> Dict[str, Any]:
        f = self.f
        f.read(2)  # sorted, open flags
        ntags = struct.unpack(">Q", f.read(8))[0]
        out: Dict[str, Any] = {}
        for i in range(ntags):
            kind = f.read(1)
            if not kind or kind[0] == 0:
                break
            name_len = struct.unpack(">H", f.read(2))[0]
            name = f.read(name_len).decode("utf-8", "replace") if name_len else str(i)
            struct.unpack(">Q", f.read(8))  # block length
            if kind[0] == 0x14:
                out[name] = self._read_dir()
            elif kind[0] == 0x15:
                out[name] = self._read_tag()
            else:
                raise ValueError(f"corrupt DM4 tag type {kind[0]:#x}")
        return out

    def _read_tag(self):
        f = self.f
        if f.read(4) != b"%%%%":
            raise ValueError("corrupt DM4 tag delimiter")
        ninfo = struct.unpack(">Q", f.read(8))[0]
        info = struct.unpack(f">{ninfo}Q", f.read(8 * ninfo))
        return self._read_data(info)

    def _read_data(self, info):
        f = self.f
        endian = "<" if self.little else ">"
        tid = info[0]
        if tid in _DM_SIMPLE:
            return np.frombuffer(f.read(_DM_SIZES[tid]),
                                 endian + _DM_SIMPLE[tid])[0]
        if tid == 18:  # string
            return f.read(info[1]).decode("utf-8", "replace")
        if tid == 15:  # struct: [15, namelen, nfields, (fnamelen, ftype)*]
            nfields = info[2]
            vals = []
            for k in range(nfields):
                ftype = info[4 + 2 * k]
                vals.append(np.frombuffer(f.read(_DM_SIZES[ftype]),
                                          endian + _DM_SIMPLE[ftype])[0])
            return tuple(vals)
        if tid == 20:  # array: [20, elemtype(...), n]
            etype = info[1]
            if etype in _DM_SIMPLE:
                n = info[-1]
                raw = f.read(int(n) * _DM_SIZES[etype])
                return np.frombuffer(raw, endian + _DM_SIMPLE[etype]).copy()
            if etype == 15:  # array of structs
                nfields = info[3]
                ftypes = [info[5 + 2 * k] for k in range(nfields)]
                n = info[-1]
                itemsize = sum(_DM_SIZES[t] for t in ftypes)
                raw = f.read(int(n) * itemsize)
                return raw  # rarely needed; keep raw bytes
            raise ValueError(f"unsupported DM4 array element type {etype}")
        raise ValueError(f"unsupported DM4 data type {tid}")


def read_dm4(path: str) -> Tuple[np.ndarray, Optional[float]]:
    """Read a .dm4 image → (data (H, W) or (Z, H, W), pixel_size Å or None)."""
    with open(path, "rb") as f:
        reader = _DM4Reader(f)
        tree = reader.read_root()

    image_list = tree.get("ImageList")
    if not image_list:
        raise ValueError(f"no ImageList in {path}")

    # Pick the entry with the largest Data payload (entry 0 is usually the
    # thumbnail; hyperspy applies the same heuristic).
    best = None
    for entry in image_list.values():
        if not isinstance(entry, dict):
            continue
        idata = entry.get("ImageData", {})
        data = idata.get("Data")
        if data is None:
            continue
        if best is None or data.size > best[0].size:
            best = (data, idata)
    if best is None:
        raise ValueError(f"no image data in {path}")
    data, idata = best

    dims = idata.get("Dimensions", {})
    shape = [int(np.asarray(dims[k]).item()) for k in sorted(dims, key=int)]
    # DM stores dimensions fastest-first (width, height[, depth]) → numpy
    # wants slowest-first.
    data = data.reshape(tuple(reversed(shape))) if shape else data

    pixel_size = None
    cal = idata.get("Calibrations", {}).get("Dimension", {})
    first = cal.get("0")
    if isinstance(first, dict):
        scale = first.get("Scale")
        units = first.get("Units")
        if units is not None and not isinstance(units, str):
            units = np.asarray(units).astype(np.uint16).tobytes().decode(
                "utf-16-le", "replace")
        if scale is not None:
            pixel_size = _unit_to_angstrom(float(scale), units or "nm")
    return data, pixel_size


# ---------------------------------------------------------------------------
# TIA .ser
# ---------------------------------------------------------------------------

_SER_DTYPES = {1: "u1", 2: "u2", 3: "u4", 4: "i1", 5: "i2", 6: "i4",
               7: "f4", 8: "f8"}


def read_ser(path: str) -> Tuple[np.ndarray, Optional[float]]:
    """Read a TIA .ser 2D image series → (data, pixel_size Å or None).

    Multiple elements are stacked along a leading axis.
    """
    with open(path, "rb") as f:
        head = f.read(22)
        byteorder, series_id, version = struct.unpack("<HHH", head[:6])
        if byteorder != 0x4949 or series_id != 0x0197:
            raise ValueError(f"not a TIA .ser file: {path}")
        datatype_id, tagtype_id, total, valid = struct.unpack(
            "<iiii", head[6:22])
        if version >= 0x0220:
            (offset_array_offset,) = struct.unpack("<q", f.read(8))
            offset_fmt = "<q"
        else:
            (offset_array_offset,) = struct.unpack("<i", f.read(4))
            offset_fmt = "<i"
        (ndim,) = struct.unpack("<i", f.read(4))
        # skip dimension arrays: each is i4 size, f8 offset, f8 delta,
        # i4 desc len, desc, i4 unit len, unit
        for _ in range(ndim):
            f.read(4 + 8 + 8)
            (dlen,) = struct.unpack("<i", f.read(4))
            f.read(dlen)
            (ulen,) = struct.unpack("<i", f.read(4))
            f.read(ulen)

        f.seek(offset_array_offset)
        width = 8 if offset_fmt == "<q" else 4
        offsets = np.frombuffer(f.read(total * width),
                                "<i8" if width == 8 else "<i4")[:valid]

        frames = []
        pixel_size = None
        for off in offsets:
            f.seek(int(off))
            if datatype_id == 0x4122:  # 2D elements
                cal = f.read(2 * (8 + 8 + 4) + 2 + 8)
                (_ox, dx, _nx_cal, _oy, _dy, _ny_cal, dtype_id,
                 nx, ny) = struct.unpack("<ddiddihii", cal)
                dt = _SER_DTYPES.get(dtype_id)
                if dt is None:
                    raise ValueError(f"unsupported .ser data type {dtype_id}")
                arr = np.frombuffer(
                    f.read(nx * ny * np.dtype(dt).itemsize), "<" + dt)
                frames.append(arr.reshape(ny, nx).copy())
                if pixel_size is None:
                    pixel_size = dx * 1e10  # TIA calibrations are meters
            else:
                raise ValueError(
                    f"unsupported .ser datatype id {datatype_id:#x} "
                    "(only 2D image series supported)")
    data = frames[0] if len(frames) == 1 else np.stack(frames)
    return data, pixel_size
