"""ctypes loader for the native host runtime (libsdnative.so) with pure
NumPy/Python fallbacks.

The native library is built on demand (`make -C runtime/native` — a single
translation unit, sub-second build) the first time it is requested; if no
compiler is available the Python fallbacks keep the pipeline fully
functional, just slower on huge inputs.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("SD-TPU")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsdnative.so")
_lib = None
_tried = False


def load_native(build: bool = True):
    """Returns the ctypes library or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception as e:  # pragma: no cover - toolchain-dependent
            logger.info("native runtime unavailable (build failed: %s)", e)
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sd_encode_validate.restype = ctypes.c_int64
    lib.sd_encode_validate.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int8),
    ]
    lib.sd_homo_compress.restype = ctypes.c_int64
    lib.sd_homo_compress.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int64, ctypes.POINTER(ctypes.c_int8),
    ]
    lib.sd_postprocess.restype = ctypes.c_int64
    lib.sd_postprocess.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.sd_format_raw.restype = ctypes.c_int64
    lib.sd_format_raw.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def _as_i32_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def postprocess_native(blocks: np.ndarray) -> np.ndarray | None:
    """blocks: [n, 4] int32 -> bool keep mask, or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    blocks = np.ascontiguousarray(blocks, dtype=np.int32)
    keep = np.zeros(len(blocks), dtype=np.uint8)
    lib.sd_postprocess(
        _as_i32_ptr(blocks), len(blocks),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)


def format_raw_native(
    blocks: np.ndarray, read_name: str, monomer_names: list[str]
) -> bytes | None:
    """Raw TSV bytes for one read's postprocessed [n,4] int32 blocks."""
    lib = load_native()
    if lib is None:
        return None
    blocks = np.ascontiguousarray(blocks, dtype=np.int32)
    names_buf = "".join(monomer_names).encode()
    offs = np.zeros(len(monomer_names) + 1, dtype=np.int64)
    np.cumsum([len(n.encode()) for n in monomer_names], out=offs[1:])
    rn = read_name.encode()
    cap = len(blocks) * (len(rn) + max((len(n) for n in monomer_names), default=0) + 96) + 64
    out = ctypes.create_string_buffer(cap)
    w = lib.sd_format_raw(
        _as_i32_ptr(blocks), len(blocks),
        rn, len(rn),
        names_buf, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out, cap,
    )
    if w < 0:
        return None
    return out.raw[:w]


def homo_compress_native(codes: np.ndarray) -> np.ndarray | None:
    lib = load_native()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    out = np.empty_like(codes)
    p = ctypes.POINTER(ctypes.c_int8)
    m = lib.sd_homo_compress(codes.ctypes.data_as(p), len(codes), out.ctypes.data_as(p))
    return out[:m]
