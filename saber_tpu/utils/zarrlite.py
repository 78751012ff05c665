"""Minimal zarr-v2-compatible directory store.

The reference stores everything in Zarr (saber/utils/zarr_writer.py,
classifier/datasets/*); the ``zarr`` package is not available in this
image, so this module implements the on-disk zarr v2 format directly:

- ``.zgroup`` / ``.zarray`` / ``.zattrs`` JSON metadata
- C-order chunks named ``i.j.k`` (NestedDirectoryStore uses ``i/j/k``;
  both are read), zlib compression (id ``zlib``, stdlib) or raw
- fill-value-aware partial chunks

Arrays written here open with the real ``zarr`` package (zlib is a
standard numcodecs codec) and vice versa for zlib/raw-compressed stores.
Thread-safe writes are provided by ``saber_tpu.utils.zarr_writer``.
"""

import json
import os
import zlib
from typing import Any, Dict, Optional, Tuple

import numpy as np

_DTYPE_MAP = {
    "|u1": np.uint8, "|i1": np.int8, "|b1": np.bool_,
    "<u2": np.uint16, "<i2": np.int16, "<u4": np.uint32, "<i4": np.int32,
    "<u8": np.uint64, "<i8": np.int64, "<f4": np.float32, "<f8": np.float64,
    "<c8": np.complex64,
}


def _dtype_str(dtype: np.dtype) -> str:
    dtype = np.dtype(dtype)
    if dtype == np.bool_:
        return "|b1"
    byteorder = "|" if dtype.itemsize == 1 else "<"
    return f"{byteorder}{dtype.kind}{dtype.itemsize}"


class Attributes(dict):
    """Dict persisted to .zattrs on mutation."""

    def __init__(self, path: str):
        self._path = os.path.join(path, ".zattrs")
        super().__init__()
        if os.path.exists(self._path):
            with open(self._path) as f:
                # plain dict.update: opening attrs must NOT rewrite the file
                # (concurrent readers would see a truncated .zattrs)
                dict.update(self, json.load(f))

    def _flush(self):
        with open(self._path, "w") as f:
            json.dump(self, f, indent=1, default=str)

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        self._flush()

    def update(self, *a, **kw):  # noqa: D102
        super().update(*a, **kw)
        self._flush()


class Array:
    """A zarr v2 chunked N-D array backed by a directory."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, ".zarray")) as f:
            meta = json.load(f)
        self.shape = tuple(meta["shape"])
        self.chunks = tuple(meta["chunks"])
        self.dtype = np.dtype(_DTYPE_MAP[meta["dtype"]])
        self.fill_value = meta.get("fill_value", 0)
        comp = meta.get("compressor")
        if comp and comp.get("id") != "zlib":
            # externally written stores usually use blosc; decoding them as
            # raw bytes would yield garbage — fail loudly instead.
            raise NotImplementedError(
                f"zarrlite supports only zlib-compressed or raw chunks, "
                f"got compressor {comp.get('id')!r} in {path}")
        self._zlib = bool(comp)
        self._sep = "/" if meta.get("dimension_separator") == "/" else "."
        self.attrs = Attributes(path)

    # -- creation ------------------------------------------------------

    @staticmethod
    def create(path: str, shape, chunks=None, dtype=np.float32,
               fill_value=0, compressor: str = "zlib",
               dimension_separator: str = ".") -> "Array":
        os.makedirs(path, exist_ok=True)
        shape = tuple(int(s) for s in shape)
        if chunks is None:
            chunks = tuple(min(s, 256) for s in shape)
        meta = {
            "zarr_format": 2,
            "shape": list(shape),
            "chunks": [int(c) for c in chunks],
            "dtype": _dtype_str(dtype),
            "compressor": {"id": "zlib", "level": 4} if compressor == "zlib" else None,
            "fill_value": fill_value,
            "order": "C",
            "filters": None,
            "dimension_separator": dimension_separator,
        }
        with open(os.path.join(path, ".zarray"), "w") as f:
            json.dump(meta, f, indent=1)
        return Array(path)

    # -- chunk io ------------------------------------------------------

    def _chunk_file(self, idx: Tuple[int, ...]) -> str:
        name = self._sep.join(str(i) for i in idx)
        return os.path.join(self.path, name)

    def _read_chunk(self, idx) -> np.ndarray:
        f = self._chunk_file(idx)
        shape = self.chunks
        if not os.path.exists(f):
            return np.full(shape, self.fill_value, self.dtype)
        with open(f, "rb") as fh:
            raw = fh.read()
        if self._zlib:
            raw = zlib.decompress(raw)
        return np.frombuffer(raw, self.dtype).reshape(shape).copy()

    def _write_chunk(self, idx, data: np.ndarray):
        raw = np.ascontiguousarray(data, self.dtype).tobytes()
        if self._zlib:
            raw = zlib.compress(raw, 4)
        f = self._chunk_file(idx)
        os.makedirs(os.path.dirname(f), exist_ok=True) if self._sep == "/" else None
        with open(f, "wb") as fh:
            fh.write(raw)

    # -- numpy-style access -------------------------------------------

    def _normalize_sel(self, sel):
        if not isinstance(sel, tuple):
            sel = (sel,)
        sel = sel + (slice(None),) * (len(self.shape) - len(sel))
        out = []
        for s, n in zip(sel, self.shape):
            if isinstance(s, slice):
                out.append(tuple(range(*s.indices(n))))
            elif np.isscalar(s) or isinstance(s, (int, np.integer)):
                out.append((int(s) % n,))
            else:
                raise TypeError(f"unsupported index {s!r}")
        scalar_axes = [i for i, s in enumerate(sel)
                       if np.isscalar(s) or isinstance(s, (int, np.integer))]
        return out, scalar_axes

    def __getitem__(self, sel):
        idxs, scalar_axes = self._normalize_sel(sel)
        out_shape = tuple(len(ix) for ix in idxs)
        out = np.empty(out_shape, self.dtype)
        self._gather(idxs, out)
        if scalar_axes:
            out = np.squeeze(out, axis=tuple(scalar_axes))
        return out

    def _chunk_ranges(self, idxs):
        """Group requested indices per chunk along each axis."""
        per_axis = []
        for ax, ix in enumerate(idxs):
            groups: Dict[int, list] = {}
            for pos, i in enumerate(ix):
                groups.setdefault(i // self.chunks[ax], []).append((pos, i))
            per_axis.append(groups)
        return per_axis

    def _gather(self, idxs, out):
        per_axis = self._chunk_ranges(idxs)

        def rec(ax, chunk_idx, out_sel, in_sel):
            if ax == len(self.shape):
                chunk = self._read_chunk(tuple(chunk_idx))
                out[np.ix_(*out_sel)] = chunk[np.ix_(*in_sel)]
                return
            for ci, items in per_axis[ax].items():
                o = [p for p, _ in items]
                l = [i - ci * self.chunks[ax] for _, i in items]
                rec(ax + 1, chunk_idx + [ci], out_sel + [o], in_sel + [l])

        rec(0, [], [], [])

    def __setitem__(self, sel, value):
        idxs, _ = self._normalize_sel(sel)
        shape = tuple(len(ix) for ix in idxs)
        value = np.broadcast_to(np.asarray(value, self.dtype), shape)
        per_axis = self._chunk_ranges(idxs)

        def rec(ax, chunk_idx, val_sel, in_sel):
            if ax == len(self.shape):
                ci = tuple(chunk_idx)
                chunk = self._read_chunk(ci)
                chunk[np.ix_(*in_sel)] = value[np.ix_(*val_sel)]
                self._write_chunk(ci, chunk)
                return
            for c, items in per_axis[ax].items():
                v = [p for p, _ in items]
                l = [i - c * self.chunks[ax] for _, i in items]
                rec(ax + 1, chunk_idx + [c], val_sel + [v], in_sel + [l])

        rec(0, [], [], [])

    def __array__(self, dtype=None):
        arr = self[(slice(None),) * len(self.shape)]
        return arr.astype(dtype) if dtype is not None else arr

    @property
    def ndim(self):
        return len(self.shape)

    def __len__(self):
        return self.shape[0]


class Group:
    """A zarr v2 group (directory with .zgroup)."""

    def __init__(self, path: str):
        self.path = path
        self.attrs = Attributes(path)

    @staticmethod
    def create(path: str) -> "Group":
        os.makedirs(path, exist_ok=True)
        zg = os.path.join(path, ".zgroup")
        if not os.path.exists(zg):
            with open(zg, "w") as f:
                json.dump({"zarr_format": 2}, f)
        return Group(path)

    def create_group(self, name: str) -> "Group":
        return Group.create(os.path.join(self.path, name))

    def require_group(self, name: str) -> "Group":
        return self.create_group(name)

    def create_dataset(self, name: str, data: Optional[np.ndarray] = None,
                       shape=None, chunks=None, dtype=None, overwrite=True,
                       fill_value=0, **kw) -> Array:
        path = os.path.join(self.path, name)
        if data is not None:
            data = np.asarray(data)
            shape = data.shape
            dtype = dtype or data.dtype
        if os.path.exists(os.path.join(path, ".zarray")) and not overwrite:
            raise ValueError(f"dataset {name} exists")
        arr = Array.create(path, shape, chunks=chunks,
                           dtype=dtype or np.float32, fill_value=fill_value)
        if data is not None and data.size:
            arr[(slice(None),) * data.ndim] = data
        return arr

    def __getitem__(self, name: str):
        path = os.path.join(self.path, str(name))
        if os.path.exists(os.path.join(path, ".zarray")):
            return Array(path)
        if os.path.exists(os.path.join(path, ".zgroup")):
            return Group(path)
        raise KeyError(name)

    def __contains__(self, name: str) -> bool:
        path = os.path.join(self.path, str(name))
        return (os.path.exists(os.path.join(path, ".zarray"))
                or os.path.exists(os.path.join(path, ".zgroup")))

    def keys(self):
        if not os.path.isdir(self.path):
            return
        for name in sorted(os.listdir(self.path)):
            sub = os.path.join(self.path, name)
            if os.path.isdir(sub) and (
                    os.path.exists(os.path.join(sub, ".zarray"))
                    or os.path.exists(os.path.join(sub, ".zgroup"))):
                yield name

    def __iter__(self):
        return self.keys()

    def items(self):
        for k in self.keys():
            yield k, self[k]


def open_group(path: str, mode: str = "a") -> Group:
    """zarr.open-style entry point for groups."""
    if mode in ("w", "a"):
        if mode == "w" and os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        return Group.create(path)
    if not os.path.exists(os.path.join(path, ".zgroup")):
        raise FileNotFoundError(path)
    return Group(path)


def open_array(path: str) -> Array:
    return Array(path)
