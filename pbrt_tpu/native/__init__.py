"""Host-native (C++) components, loaded via ctypes.

The reference's whole accelerator/build tier is compiled native code (Rust,
accelerators/src/bvh/). Our split: DEVICE hot loops are XLA/Pallas kernels;
HOST build/IO steps that the reference implements natively are C++ here,
compiled once on first use into this directory (g++ is in the image;
pybind11 is not, hence the plain C ABI + ctypes).

Falls back gracefully (returns None) when no compiler is available so the
pure-numpy builders keep everything working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}

_SOURCES = {
    "bvh_builder": ["bvh_builder.cpp"],
    "kdtree_builder": ["kdtree_builder.cpp"],
}


def _build(name: str) -> str | None:
    so_path = os.path.join(_DIR, f"_{name}.so")
    srcs = [os.path.join(_DIR, s) for s in _SOURCES[name]]
    if os.path.exists(so_path) and all(
            os.path.getmtime(so_path) >= os.path.getmtime(s) for s in srcs):
        return so_path
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", so_path] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None
    return so_path


def load(name: str):
    """Load (building if needed) native library `name`; None on failure."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _build(name)
        lib = None
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                lib = None
        _LIBS[name] = lib
        return lib


def bvh_builder():
    """-> configured ctypes fn pbrt_bvh_build, or None."""
    lib = load("bvh_builder")
    if lib is None:
        return None
    fn = lib.pbrt_bvh_build
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    fn.argtypes = [c_f32p, c_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                   c_f32p, c_f32p, c_i32p, c_i32p, c_i32p, c_i32p, c_i32p]
    fn.restype = ctypes.c_int
    return fn
