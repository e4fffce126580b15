"""Native host-side data runtime (C++ via ctypes) with numpy fallbacks.

Compiled lazily on first use (g++ -O3 -shared); every entry point has a
pure-numpy fallback so the framework degrades gracefully where no
toolchain exists. See native/pdm_runtime.cpp for the C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "pdm_runtime.cpp")
_LIB_PATH = os.path.join(_HERE, "native", "libpdm_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                _SRC, "-o", _LIB_PATH,
            ],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first call; None if the
    toolchain is unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.pdm_version  # probe the ABI before trusting the binary
        except (OSError, AttributeError):
            # stale or wrong-arch binary (e.g. left over from another
            # machine): rebuild once, then fall back to numpy
            if not _build():
                _build_failed = True
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.pdm_version  # re-probe the rebuilt binary too
            except (OSError, AttributeError):
                _build_failed = True
                return None
        try:
            lib.pdm_normalize_u8_hwc_to_f32_chw.argtypes = [
                _u8p, _f32p, _i64, _i64, _i64, _i64
            ]
            lib.pdm_resize_bilinear_u8.argtypes = [
                _u8p, _u8p, _i64, _i64, _i64, _i64, _i64, _i64
            ]
            lib.pdm_gather_rows_f32.argtypes = [_f32p, _i64p, _f32p, _i64, _i64]
            lib.pdm_gather_rows_u8_to_f32.argtypes = [
                _u8p, _i64p, _f32p, _i64, _i64
            ]
            lib.pdm_stream_mean.argtypes = [
                _f32p, _i64, _i64, _f64p, ctypes.POINTER(_i64)
            ]
            lib.pdm_version.restype = _i64
        except AttributeError:
            # binary from an older source revision missing a symbol:
            # degrade to the numpy fallback instead of crashing at use time
            _build_failed = True
            return None
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# public ops (native fast path + numpy fallback)
# ---------------------------------------------------------------------------


def normalize_u8_to_chw_f32(images: np.ndarray) -> np.ndarray:
    """(N, H, W, C) uint8 -> (N, C, H, W) float32 in [-1, 1]."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = images.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, c, h, w), np.float32)
        lib.pdm_normalize_u8_hwc_to_f32_chw(images, out, n, h, w, c)
        return out
    return np.transpose(
        images.astype(np.float32) * (2.0 / 255.0) - 1.0, (0, 3, 1, 2)
    )


def resize_bilinear_u8(images: np.ndarray, h_out: int, w_out: int) -> np.ndarray:
    """(N, H, W, C) uint8 -> (N, h_out, w_out, C) uint8 (align-corners
    bilinear)."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = images.shape
    if (h, w) == (h_out, w_out):
        return images
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, h_out, w_out, c), np.uint8)
        lib.pdm_resize_bilinear_u8(images, out, n, h, w, h_out, w_out, c)
        return out
    # numpy fallback (align-corners bilinear)
    ys = np.linspace(0, h - 1, h_out)
    xs = np.linspace(0, w - 1, w_out)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    img = images.astype(np.float32)
    top = img[:, y0][:, :, x0] * (1 - wx) + img[:, y0][:, :, x1] * wx
    bot = img[:, y1][:, :, x0] * (1 - wx) + img[:, y1][:, :, x1] * wx
    return (top * (1 - wy) + bot * wy + 0.5).astype(np.uint8)


def gather_rows(data: np.ndarray, idx: np.ndarray, out: Optional[np.ndarray] = None) -> np.ndarray:
    """out[i] = data[idx[i]] for a 2-D host matrix (fp32 or uint8 source;
    uint8 decodes to [-1, 1] fp32 on the fly)."""
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    rows = idx.shape[0]
    row_elems = int(np.prod(data.shape[1:]))
    flat = data.reshape(data.shape[0], row_elems)
    lib = get_lib()
    if out is None:
        out = np.empty((rows, row_elems), np.float32)
    elif out.size != rows * row_elems:
        raise ValueError(
            f"gather_rows: out has {out.size} elements, need "
            f"{rows}*{row_elems} (the native kernel writes exactly that)"
        )
    if lib is not None and flat.flags["C_CONTIGUOUS"]:
        if flat.dtype == np.float32:
            lib.pdm_gather_rows_f32(flat, idx, out, rows, row_elems)
        elif flat.dtype == np.uint8:
            lib.pdm_gather_rows_u8_to_f32(flat, idx, out, rows, row_elems)
        else:
            out[:] = flat[idx].astype(np.float32)
    else:
        if flat.dtype == np.uint8:
            out[:] = flat[idx].astype(np.float32) * (2.0 / 255.0) - 1.0
        else:
            out[:] = flat[idx].astype(np.float32)
    return out.reshape(rows, *data.shape[1:])


# ---------------------------------------------------------------------------
# memory-mapped dataset cache
# ---------------------------------------------------------------------------

_MAGIC = b"PDMC0001"


def write_cache(path: str, array: np.ndarray) -> None:
    """Binary cache: 8-byte magic, dtype code, ndim, shape, raw data.
    Memory-mappable for instant re-ingest."""
    dtype_code = {np.dtype(np.uint8): 0, np.dtype(np.float32): 1}[array.dtype]
    with open(path, "wb") as f:
        f.write(_MAGIC)
        header = np.array([dtype_code, array.ndim, *array.shape], np.int64)
        f.write(np.array([header.size], np.int64).tobytes())
        f.write(header.tobytes())
        f.write(np.ascontiguousarray(array).tobytes())


def read_cache(path: str, mmap: bool = True) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.read(8) == _MAGIC, f"not a PDMC cache: {path}"
        (hsize,) = np.frombuffer(f.read(8), np.int64)
        header = np.frombuffer(f.read(8 * int(hsize)), np.int64)
        offset = f.tell()
    dtype = {0: np.uint8, 1: np.float32}[int(header[0])]
    shape = tuple(int(s) for s in header[2 : 2 + int(header[1])])
    if mmap:
        return np.memmap(path, dtype=dtype, mode="r", offset=offset, shape=shape)
    with open(path, "rb") as f:
        f.seek(offset)
        return np.frombuffer(f.read(), dtype=dtype).reshape(shape)
