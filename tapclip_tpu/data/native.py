"""ctypes binding for the native C++ image pipeline.

Builds ``native/libtapclip_image.so`` on first use (g++ + libjpeg/libpng) and
exposes batch decode+preprocess.  Falls back cleanly when the toolchain or
libraries are unavailable — callers use :func:`available` to pick a backend.

The native path replaces PIL in the hot loader loop: JPEG decode,
PIL-compatible antialiased bicubic resize (shorter side), center crop and
CLIP normalization happen in C++ with an internal thread pool.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtapclip_image.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string or None."""
    src = os.path.join(_NATIVE_DIR, "image_pipeline.cpp")
    if not os.path.exists(src):
        return f"source not found: {src}"
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-fPIC", "-shared", "-std=c++17",
        "-o", _SO_PATH, src,
        "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"compile failed: {e}"
    if proc.returncode != 0:
        return f"compile failed: {proc.stderr[-2000:]}"
    return None


def _abi_ok(lib) -> bool:
    """True iff the loaded library exposes the current (v4) ABI."""
    if not all(
        hasattr(lib, sym)
        for sym in ("tapclip_decode_batch_ex", "tapclip_decode_bytes_batch_ex",
                    "tapclip_decode_batch_u8", "tapclip_decode_bytes_batch_u8",
                    "tapclip_decode_one", "tapclip_abi_version")
    ):
        return False
    lib.tapclip_abi_version.restype = ctypes.c_int
    return lib.tapclip_abi_version() == 4


def _load():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "image_pipeline.cpp")
        ):
            err = _build()
            if err:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        if not _abi_ok(lib):
            # Stale artifact (e.g. a cached .so newer than the source, built
            # from an older checkout): rebuild once, then give up cleanly so
            # callers fall back to PIL instead of crashing on a missing
            # symbol mid-iteration.
            err = _build()
            if err:
                _build_error = err
                return None
            try:
                lib = ctypes.CDLL(_SO_PATH)
            except OSError as e:
                _build_error = str(e)
                return None
            if not _abi_ok(lib):
                _build_error = "ABI version mismatch"
                return None
        lib.tapclip_decode_batch_ex.restype = ctypes.c_int
        lib.tapclip_decode_batch_ex.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.tapclip_decode_one.restype = ctypes.c_int
        lib.tapclip_decode_one.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tapclip_decode_bytes_batch_ex.restype = ctypes.c_int
        lib.tapclip_decode_bytes_batch_ex.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.tapclip_decode_batch_u8.restype = ctypes.c_int
        lib.tapclip_decode_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.tapclip_decode_bytes_batch_u8.restype = ctypes.c_int
        lib.tapclip_decode_bytes_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode_batch(
    paths: Sequence[str],
    image_size: int = 224,
    *,
    do_normalize: bool = True,
    num_threads: int = 0,
    fast_decode: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+preprocess files -> (images [N, S, S, 3] f32, ok [N] bool).

    ``fast_decode=True`` enables DCT-scaled JPEG decode (PIL ``draft``
    semantics: the IDCT emits at the largest of 1/2, 1/4, 1/8 scale that
    keeps the short side >= ``image_size``).  Opt-in throughput mode — the
    resampled pixels are near- but not bit-identical to the exact path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.float32)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.tapclip_decode_batch_ex(
        arr,
        n,
        image_size,
        1 if do_normalize else 0,
        1 if fast_decode else 0,
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, ok.astype(bool)


def decode_bytes_batch(
    blobs: Sequence[bytes],
    image_size: int = 224,
    *,
    do_normalize: bool = True,
    num_threads: int = 0,
    fast_decode: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+preprocess in-memory encoded images (webdataset/CSV streaming)
    -> (images [N, S, S, 3] f32, ok [N] bool). Bit-identical to the
    path-based :func:`decode_batch` on the same bytes (same ``fast_decode``
    setting on both sides)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    n = len(blobs)
    out = np.empty((n, image_size, image_size, 3), np.float32)
    ok = np.zeros((n,), np.uint8)
    # c_char_p rows are fine for binary payloads here: lengths travel
    # separately, so embedded NULs don't truncate anything.
    arr = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.tapclip_decode_bytes_batch_ex(
        arr,
        lens,
        n,
        image_size,
        1 if do_normalize else 0,
        1 if fast_decode else 0,
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, ok.astype(bool)


def decode_one(path: str, image_size: int = 224, do_normalize: bool = True) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    out = np.empty((image_size, image_size, 3), np.float32)
    rc = lib.tapclip_decode_one(
        path.encode(), image_size, 1 if do_normalize else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 1:
        raise IOError(f"failed to decode {path}")
    return out


def decode_batch_u8(
    paths: Sequence[str],
    image_size: int = 224,
    *,
    num_threads: int = 0,
    fast_decode: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+preprocess files -> (images [N, S, S, 3] uint8, ok [N] bool).

    The uint8 transport path with zero float conversion: output rows are
    the PIL-exact resample's bytes directly (bit-identical to quantizing
    the float path's unnormalized output).  Normalization fuses on device
    (``preprocess.device_normalize``).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.tapclip_decode_batch_u8(
        arr,
        n,
        image_size,
        1 if fast_decode else 0,
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, ok.astype(bool)


def decode_bytes_batch_u8(
    blobs: Sequence[bytes],
    image_size: int = 224,
    *,
    num_threads: int = 0,
    fast_decode: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """uint8 variant of :func:`decode_bytes_batch` (see decode_batch_u8)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    n = len(blobs)
    out = np.empty((n, image_size, image_size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.tapclip_decode_bytes_batch_u8(
        arr,
        lens,
        n,
        image_size,
        1 if fast_decode else 0,
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, ok.astype(bool)
