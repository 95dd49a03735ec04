"""Native (C++) components, built on demand with g++ and loaded via ctypes."""

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIBS = {}

_DIR = os.path.dirname(os.path.abspath(__file__))


def load_library(name: str):
    """Compile (if needed) and load lib{name}.so from this directory."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"lib{name}.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        _LIBS[name] = lib
        return lib


def cocoeval_lib():
    """ctypes handle for the COCO evaluation inner loop, or None if the
    toolchain is unavailable (callers fall back to numpy)."""
    try:
        lib = load_library("cocoeval")
    except Exception:
        return None
    import ctypes as ct

    lib.evaluate_img.argtypes = [
        ct.POINTER(ct.c_double), ct.c_int64,
        ct.POINTER(ct.c_double), ct.c_int64,
        ct.POINTER(ct.c_uint8),
        ct.POINTER(ct.c_uint8),
        ct.POINTER(ct.c_double), ct.c_int64,
        ct.c_double, ct.c_double,
        ct.POINTER(ct.c_uint8),
        ct.POINTER(ct.c_uint8),
    ]
    lib.evaluate_img.restype = None
    return lib
