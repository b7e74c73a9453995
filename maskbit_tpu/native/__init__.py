"""Native (C++/libjpeg) decode kernel for the data pipeline.

The runtime around the XLA compute path is allowed to be native where it
pays: JPEG decode is the framework's only host-bound stage (the PIL path
costs ~5.7 ms/img per core — one chip's worth; a multi-chip host starves).
`decode_crop_resize` runs bytes -> cropped/resized uint8 HWC in one C++
pass (DCT-domain scaled decode for large sources) and releases the GIL, so
the thread-pool decode backend scales across cores.

The shared library is compiled from decode.cc on first use with the system
g++/libjpeg (no pip deps) and cached next to this file — or, when the
package directory is read-only (site-packages installs), under
`$XDG_CACHE_HOME/maskbit_tpu/` keyed by source hash. `is_available()`
gates all callers, which fall back to the PIL path when the toolchain or
libjpeg is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decode.cc")
_LIB_PATH = os.path.join(_DIR, "libmaskbit_decode.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _cache_lib_path() -> str:
    """Per-user fallback .so path when the package directory is read-only
    (a site-packages install). Keyed by the source hash so a package upgrade
    rebuilds instead of dlopen-ing a stale cache."""
    import hashlib

    from maskbit_tpu.utils.paths import user_cache_dir

    with open(_SRC, "rb") as f:
        src_hash = hashlib.sha256(f.read()).hexdigest()[:12]
    return user_cache_dir(f"libmaskbit_decode-{src_hash}.so")


def _build(lib_path: str) -> Optional[str]:
    """Compile decode.cc -> `lib_path`. Returns an error or None.

    Compiles to a per-process temp path and os.rename()s into place:
    concurrent processes (a train CLI + an eval CLI, parallel test workers)
    may build simultaneously, and a reader must never dlopen a half-written
    file — rename within one directory is atomic, last writer wins."""
    tmp_path = f"{lib_path}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        _SRC, "-ljpeg", "-o", tmp_path,
    ]
    try:
        os.makedirs(os.path.dirname(lib_path), exist_ok=True)
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            return proc.stderr[-2000:]
        os.rename(tmp_path, lib_path)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{type(e).__name__}: {e}"
    finally:
        if os.path.exists(tmp_path):
            try:
                os.remove(tmp_path)
            except OSError:
                pass
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        # prefer the package-dir .so (dev checkout; mtime-checked against the
        # source); read-only installs build into a per-user cache instead
        if os.path.exists(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
        ):
            lib_path = _LIB_PATH
        else:
            lib_path = _LIB_PATH if os.access(_DIR, os.W_OK) else _cache_lib_path()
            if lib_path == _LIB_PATH or not os.path.exists(lib_path):
                err = _build(lib_path)
                if err is not None:
                    _build_error = err
                    return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.mb_decode_info.restype = ctypes.c_int
        lib.mb_decode_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mb_decode_crop_resize.restype = ctypes.c_int
        lib.mb_decode_crop_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode_info(buf: bytes) -> Tuple[int, int]:
    """(width, height) from the JPEG header only."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native decode unavailable: {_build_error}")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.mb_decode_info(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"not a decodable JPEG (rc={rc})")
    return w.value, h.value


FILTERS = {"bilinear": 0, "bicubic": 1}


def decode_crop_resize(
    buf: bytes,
    top: float,
    left: float,
    crop_h: float,
    crop_w: float,
    out_h: int,
    out_w: int,
    flip: bool = False,
    interpolation: str = "bilinear",
) -> np.ndarray:
    """JPEG bytes -> (out_h, out_w, 3) uint8: decode (DCT-scaled when the
    crop oversamples the output), crop the full-resolution box, resize with
    `interpolation` (bilinear or bicubic/Keys a=-0.5 — the two filters the
    configs use), optional horizontal flip. Releases the GIL."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native decode unavailable: {_build_error}")
    if interpolation not in FILTERS:
        raise ValueError(f"unsupported native interpolation {interpolation!r}")
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.mb_decode_crop_resize(
        buf, len(buf), float(top), float(left), float(crop_h), float(crop_w),
        int(out_h), int(out_w), int(bool(flip)), FILTERS[interpolation],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    return out
