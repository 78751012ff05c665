"""File-format boundary (reference saber/utils/io.py).

Readers/writers for the EM formats the reference supports, without its
optional heavy deps: MRC is parsed directly (the format is a fixed
1024-byte header + data; mrcfile is not installed), TIFF goes through
imageio, STEM formats (.dm4/.ser) use the pure-numpy parsers in
stem_io.py. Device selection is a no-op under JAX (placement is
mesh-driven), kept for API parity.
"""

import glob
import os
from typing import Optional, Tuple

import numpy as np

from saber_tpu.ops.downsample import FourierRescale2D

# MRC mode → dtype (MRC2014 standard)
_MRC_MODES = {0: np.int8, 1: np.int16, 2: np.float32, 6: np.uint16,
              12: np.float16}
_INV_MODES = {np.dtype(v): k for k, v in _MRC_MODES.items()}


def read_mrc(path: str) -> Tuple[np.ndarray, float]:
    """Read an MRC file → (data (nz, ny, nx), pixel_size Å)."""
    with open(path, "rb") as f:
        header = f.read(1024)
        h = np.frombuffer(header, np.int32, 256)
        hf = np.frombuffer(header, np.float32, 256)
        nx, ny, nz, mode = int(h[0]), int(h[1]), int(h[2]), int(h[3])
        mx = int(h[7]) or nx
        xlen = float(hf[10])
        pixel_size = xlen / mx if mx else 1.0
        nsymbt = int(h[23])
        if mode not in _MRC_MODES:
            raise ValueError(f"unsupported MRC mode {mode} in {path}")
        f.seek(1024 + nsymbt)
        data = np.fromfile(f, _MRC_MODES[mode], nx * ny * nz)
    data = data.reshape(nz, ny, nx)
    return data, (pixel_size if pixel_size > 0 else 1.0)


def write_mrc(path: str, data: np.ndarray, pixel_size: float = 1.0):
    """Write an MRC2014 file."""
    data = np.asarray(data)
    if data.ndim == 2:
        data = data[None]
    dtype = data.dtype
    if dtype not in _INV_MODES:
        data = data.astype(np.float32)
        dtype = data.dtype
    nz, ny, nx = data.shape
    h = np.zeros(256, np.int32)
    hf = h.view(np.float32)
    h[0], h[1], h[2], h[3] = nx, ny, nz, _INV_MODES[dtype]
    h[7], h[8], h[9] = nx, ny, nz
    hf[10], hf[11], hf[12] = nx * pixel_size, ny * pixel_size, nz * pixel_size
    hf[13] = hf[14] = hf[15] = 90.0
    h[16], h[17], h[18] = 1, 2, 3
    hf[19], hf[20], hf[21] = float(data.min()), float(data.max()), float(data.mean())
    h[52] = int.from_bytes(b"MAP ", "little")
    h[53] = int.from_bytes(b"\x44\x41\x00\x00", "little")  # little-endian stamp
    with open(path, "wb") as f:
        f.write(h.tobytes())
        f.write(np.ascontiguousarray(data).tobytes())


def read_micrograph(path: str) -> Tuple[np.ndarray, Optional[float]]:
    """Read a 2D micrograph (reference io.py:43-91) → (image, pixel_size)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".mrc", ".mrcs", ".rec", ".map"):
        data, pix = read_mrc(path)
        return np.squeeze(data), pix
    if ext in (".tif", ".tiff", ".png", ".jpg", ".jpeg"):
        import imageio.v2 as imageio
        img = np.asarray(imageio.imread(path))
        if img.ndim == 3:
            img = img.mean(axis=-1)
        return img.astype(np.float32), None
    if ext == ".dm4":
        from saber_tpu.utils.stem_io import read_dm4
        return read_dm4(path)
    if ext == ".ser":
        from saber_tpu.utils.stem_io import read_ser
        return read_ser(path)
    raise ValueError(f"unsupported micrograph format: {ext}")


def read_movie(paths_or_glob, target_resolution: Optional[float] = None,
               input_resolution: Optional[float] = None) -> np.ndarray:
    """Glob'd TIFF stack → (Z, H, W) volume with optional per-slice
    Fourier downsampling (reference io.py:12-41)."""
    if isinstance(paths_or_glob, str):
        files = sorted(glob.glob(paths_or_glob))
    else:
        files = list(paths_or_glob)
    if not files:
        raise FileNotFoundError(f"no frames match {paths_or_glob}")
    frames = []
    for f in files:
        img, pix = read_micrograph(f)
        if target_resolution and (input_resolution or pix):
            in_res = input_resolution or pix
            if target_resolution > in_res:
                img = FourierRescale2D.run_resolution(
                    np.asarray(img, np.float32), in_res, target_resolution)
        frames.append(np.asarray(img, np.float32))
    return np.stack(frames)


def read_tomogram(path: str, voxel_size: Optional[float] = None
                  ) -> Tuple[np.ndarray, float]:
    """Read a 3D volume (MRC) with optional Fourier rescale to voxel_size."""
    vol, pix = read_mrc(path)
    if voxel_size and voxel_size > pix:
        from saber_tpu.ops.downsample import FourierRescale3D
        vol = FourierRescale3D(pix, voxel_size).run(vol.astype(np.float32))
        pix = voxel_size
    return vol, pix


def get_available_devices(deviceID: Optional[int] = None):
    """API-parity shim (reference io.py:93-149): JAX owns placement."""
    import jax
    devices = jax.devices()
    if deviceID is not None and deviceID < len(devices):
        return devices[deviceID]
    return devices[0]


def save_copick_metadata(path: str, metadata: dict):
    """YAML audit log of an inference run (reference io.py:165-180)."""
    import yaml
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(metadata, f)


def get_metadata(zarr_path: str) -> Tuple[dict, dict]:
    """Read class labels + AMG params from zarr attrs (reference io.py:182-196)."""
    from saber_tpu.utils import zarrlite
    root = zarrlite.open_group(zarr_path, mode="r")
    labels = root.attrs.get("labels", {})
    amg = root.attrs.get("amg", root.attrs.get("amg_params", {}))
    return labels, amg
