"""Build/load the native host library (BGZF+BAM reader).

Compiled on demand with g++ (no pybind11 in this image — plain C ABI +
ctypes). The .so is cached next to the source and rebuilt when the source is
newer.
"""

from __future__ import annotations

import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "bam_reader.cpp"
_LIB = _DIR / "libsctag_io.so"


def ensure_built() -> pathlib.Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB), "-lz",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def load():
    import ctypes

    lib = ctypes.CDLL(str(ensure_built()))
    lib.sctag_extract_cb.restype = ctypes.c_int
    lib.sctag_extract_cb.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_char_p),
    ]
    lib.sctag_free.restype = None
    lib.sctag_free.argtypes = [ctypes.c_void_p]
    return lib
