"""ctypes bindings for the native decode/resize library.

The C++ layer (native/decoder.cpp) replaces PIL-in-worker-process decode
(the reference's data plane) with an in-process thread pool writing
float32 NHWC batches directly into numpy buffers. Falls back to the PIL
path transparently when the library isn't built.

Build: ``bash native/build.sh`` (libpng/libjpeg/zlib, baked into the
image).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libnqa_decoder.so",
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise RuntimeError(
            f"native decoder not built ({_LIB_PATH}); run native/build.sh"
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nqa_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.nqa_decode_resize.restype = ctypes.c_int
    lib.nqa_image_size.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.nqa_image_size.restype = ctypes.c_int
    lib.nqa_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.nqa_decode_resize_batch.restype = ctypes.c_int
    lib.nqa_mp4_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.nqa_mp4_probe.restype = ctypes.c_int
    lib.nqa_mp4_decode_frames.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.nqa_mp4_decode_frames.restype = ctypes.c_int
    # fast-decode variants (DCT-scaled JPEG); absent in older .so builds
    if hasattr(lib, "nqa_decode_resize2"):
        lib.nqa_decode_resize2.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.nqa_decode_resize2.restype = ctypes.c_int
        lib.nqa_decode_resize_batch2.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.nqa_decode_resize_batch2.restype = ctypes.c_int
        lib.nqa_mp4_decode_frames2.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.nqa_mp4_decode_frames2.restype = ctypes.c_int
    _lib = lib
    return lib


def fast_decode_available() -> bool:
    """True when the built .so exports the DCT-scaled fast-decode ABI."""
    try:
        return hasattr(_load(), "nqa_decode_resize2")
    except RuntimeError:
        return False


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def image_size(path: str) -> tuple[int, int]:
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.nqa_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"decode failed: {path}")
    return h.value, w.value


def decode_resize(path: str, out_h: int, out_w: int,
                  fast: bool = False) -> np.ndarray:
    """Decode + bilinear resize to float32 (out_h, out_w, 3) in [0,1];
    RGBA composites onto white (matches data/imaging.load_image_rgb).
    fast=True permits a DCT-scaled JPEG decode (largest 1/{2,4,8} that
    still covers the target; ~1.5-2x faster for 1080p -> 256²). The DCT
    scale antialiases where the full-res bilinear path aliases — see
    data/imaging.fast_decode_enabled for the measured scoring caveat;
    PNG is unaffected."""
    lib = _load()
    out = np.empty((out_h, out_w, 3), np.float32)
    if fast and hasattr(lib, "nqa_decode_resize2"):
        rc = lib.nqa_decode_resize2(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w, 1,
        )
    else:
        rc = lib.nqa_decode_resize(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w,
        )
    if rc:
        raise IOError(f"decode failed: {path}")
    return out


def decode_resize_batch(paths: list[str], out_h: int, out_w: int,
                        threads: int = 8, fast: bool = False) -> np.ndarray:
    """Parallel decode+resize into one (N, out_h, out_w, 3) f32 batch."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if fast and hasattr(lib, "nqa_decode_resize_batch2"):
        failures = lib.nqa_decode_resize_batch2(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w, threads, 1,
        )
    else:
        failures = lib.nqa_decode_resize_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w, threads,
        )
    if failures:
        raise IOError(f"{failures}/{n} decodes failed")
    return out


def mp4_probe(path: str) -> tuple[str, int, int, int]:
    """Probe an mp4's video track: (codec fourcc, n_frames, h, w).
    h/w are 0 for codecs the native layer can't decode (non-MJPEG)."""
    lib = _load()
    codec = ctypes.create_string_buffer(5)
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.nqa_mp4_probe(path.encode(), codec, ctypes.byref(n),
                         ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"no parseable video track: {path}")
    return codec.value.decode("latin-1"), n.value, h.value, w.value


def mp4_decode_frames(path: str, out_h: int, out_w: int, start: int = 0,
                      max_frames: int = 0, threads: int = 8,
                      fast: bool = False) -> np.ndarray:
    """Decode an MJPEG mp4's samples [start, start+max_frames) into a
    (T, out_h, out_w, 3) float32 batch (parallel across the pool).
    Raises for non-MJPEG codecs — callers fall back to ffmpeg."""
    lib = _load()
    codec, total, _, _ = mp4_probe(path)
    n = total - start if max_frames <= 0 else min(max_frames, total - start)
    n = max(n, 0)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    if fast and hasattr(lib, "nqa_mp4_decode_frames2"):
        rc = lib.nqa_mp4_decode_frames2(
            path.encode(), start, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w, threads, 1,
        )
    else:
        rc = lib.nqa_mp4_decode_frames(
            path.encode(), start, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w, threads,
        )
    if rc == -2:
        raise IOError(f"unsupported mp4 codec '{codec}': {path}")
    if rc < 0 or rc != n:
        raise IOError(f"mp4 decode failed (rc={rc}): {path}")
    return out
