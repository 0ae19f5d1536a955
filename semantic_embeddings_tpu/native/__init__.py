"""ctypes bindings for the native (C++) data-loader core.

Builds ``libsed_decode.so`` from :file:`sed_decode.cpp` on first use (g++,
linked against the system libjpeg) and exposes :func:`decode_batch`.  When
the toolchain or libjpeg is unavailable, ``loader()`` returns None and the
Python/PIL pipeline is used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sed_decode.cpp")
_LIB = os.path.join(_DIR, "libsed_decode.so")

_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB,
        "-ljpeg", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def loader():
    """Returns the loaded shared library, building it if needed; None if the
    native path is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.sed_decode_batch.restype = ctypes.c_int
        lib.sed_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,                     # n
            ctypes.POINTER(ctypes.c_int),     # target_sizes
            ctypes.POINTER(ctypes.c_uint64),  # seeds
            ctypes.c_int,                     # random_crop
            ctypes.c_int,                     # crop_h
            ctypes.c_int,                     # crop_w
            ctypes.c_int,                     # n_threads
            ctypes.POINTER(ctypes.c_uint8),   # out
            ctypes.POINTER(ctypes.c_uint8),   # ok flags
        ]
        lib.sed_decode_mem_batch.restype = ctypes.c_int
        lib.sed_decode_mem_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # buffers
            ctypes.POINTER(ctypes.c_uint64),  # lengths
            ctypes.c_int,                     # n
            ctypes.POINTER(ctypes.c_int),     # target_sizes
            ctypes.POINTER(ctypes.c_uint64),  # seeds
            ctypes.c_int,                     # random_crop
            ctypes.c_int,                     # crop_h
            ctypes.c_int,                     # crop_w
            ctypes.c_int,                     # n_threads
            ctypes.POINTER(ctypes.c_uint8),   # out
            ctypes.POINTER(ctypes.c_uint8),   # ok flags
        ]
        _lib = lib
    except Exception as e:  # noqa: BLE001 - any failure falls back to PIL
        print(f"native decoder unavailable ({e}); using PIL fallback")
        _lib = None
    return _lib


def decode_batch(paths, target_sizes, seeds, random_crop, crop_h, crop_w,
                 n_threads=8):
    """Decodes a batch of JPEGs into a (n, crop_h, crop_w, 3) uint8 array.

    Returns ``(batch, ok)`` where ``ok`` marks per-image success; failed
    images (non-JPEG, corrupt) must be filled in by the caller's fallback.
    """
    lib = loader()
    if lib is None:
        raise RuntimeError("native decoder not available")
    n = len(paths)
    out = np.empty((n, crop_h, crop_w, 3), dtype=np.uint8)
    ok = np.zeros(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths]
    )
    ts = np.ascontiguousarray(np.asarray(target_sizes, dtype=np.int32))
    sd = np.ascontiguousarray(np.asarray(seeds, dtype=np.uint64))
    lib.sed_decode_batch(
        c_paths,
        n,
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        sd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        int(bool(random_crop)),
        crop_h,
        crop_w,
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok.astype(bool)


def decode_mem_batch(blobs, target_sizes, seeds, random_crop, crop_h, crop_w,
                     n_threads=8):
    """Decodes a batch of in-memory JPEG byte strings (serving path).

    Same contract as :func:`decode_batch` but takes ``bytes`` objects
    instead of file paths.
    """
    lib = loader()
    if lib is None:
        raise RuntimeError("native decoder not available")
    n = len(blobs)
    out = np.empty((n, crop_h, crop_w, 3), dtype=np.uint8)
    ok = np.zeros(n, dtype=np.uint8)
    # keep a reference to each bytes object alive for the call duration
    bufs = (ctypes.c_void_p * n)(
        *[ctypes.cast(ctypes.c_char_p(b), ctypes.c_void_p) for b in blobs]
    )
    lens = np.ascontiguousarray(
        np.asarray([len(b) for b in blobs], dtype=np.uint64))
    ts = np.ascontiguousarray(np.asarray(target_sizes, dtype=np.int32))
    sd = np.ascontiguousarray(np.asarray(seeds, dtype=np.uint64))
    lib.sed_decode_mem_batch(
        bufs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        sd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        int(bool(random_crop)),
        crop_h,
        crop_w,
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok.astype(bool)
