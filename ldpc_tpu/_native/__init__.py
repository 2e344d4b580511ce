"""ctypes bindings for the native host core (lazy-built, optional).

``load()`` returns the loaded library handle or None. On first use the
shared library is compiled from ``ldpc_host.cpp`` with g++ into the package
directory; failures (no compiler, sandboxed FS) degrade silently to the
NumPy fallbacks in :mod:`ldpc_tpu.codes.gf2` / :mod:`ldpc_tpu.decoders.admm`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "ldpc_host.cpp")
_LIB = os.path.join(_HERE, "libldpc_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        src_t = os.path.getmtime(_SRC)
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_t:
            return True
        proc = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB + ".tmp"],
            capture_output=True, timeout=120)
        if proc.returncode != 0:
            return False
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LDPC_TPU_NO_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.ldpc_gf2_nullspace.restype = ctypes.c_int
        lib.ldpc_gf2_nullspace.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                           u8p]
        lib.ldpc_gf2_rank.restype = ctypes.c_int
        lib.ldpc_gf2_rank.argtypes = [u8p, ctypes.c_int, ctypes.c_int]
        lib.ldpc_gf2_matmul.restype = None
        lib.ldpc_gf2_matmul.argtypes = [u8p, u8p, u8p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int]
        lib.ldpc_admm_build.restype = ctypes.c_int
        lib.ldpc_admm_build.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, i32p, f32p, f32p, i32p, f32p, f32p,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def nullspace(h: np.ndarray):
    """Native GetOrtogonal; returns (G, ok) or None when lib unavailable."""
    lib = load()
    if lib is None:
        return None
    h = np.ascontiguousarray(h, dtype=np.uint8)
    m, n = h.shape
    if n <= m:
        return None
    g = np.zeros((n - m, n), np.uint8)
    ok = lib.ldpc_gf2_nullspace(h, m, n, g)
    return (g if ok else None), bool(ok)


def rank(h: np.ndarray):
    lib = load()
    if lib is None:
        return None
    h = np.ascontiguousarray(h, dtype=np.uint8)
    return int(lib.ldpc_gf2_rank(h, h.shape[0], h.shape[1]))


def gf2_matmul(a: np.ndarray, b: np.ndarray):
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    c = np.zeros((a.shape[0], b.shape[1]), np.uint8)
    lib.ldpc_gf2_matmul(a, b, c, a.shape[0], a.shape[1], b.shape[1])
    return c


def admm_build(h: np.ndarray, nv_cap: int, nc_cap: int, k_cap: int):
    """Native cascade builder. Returns dict of tables + (n_var, n_con), or
    None when the lib is unavailable / capacities too small."""
    lib = load()
    if lib is None:
        return None
    h = np.ascontiguousarray(h, np.uint8)
    m, n = h.shape
    con_var = np.empty((nc_cap, 3), np.int32)
    con_coef = np.empty((nc_cap, 3), np.float32)
    b = np.empty((nc_cap,), np.float32)
    var_con = np.empty((nv_cap, k_cap), np.int32)
    var_coef = np.empty((nv_cap, k_cap), np.float32)
    e = np.empty((nv_cap,), np.float32)
    n_var = ctypes.c_int(0)
    n_con = lib.ldpc_admm_build(h, m, n, nv_cap, nc_cap, k_cap,
                                con_var, con_coef, b, var_con, var_coef, e,
                                ctypes.byref(n_var))
    if n_con < 0:
        return None
    return {"con_var": con_var, "con_coef": con_coef, "b": b,
            "var_con": var_con, "var_coef": var_coef, "e": e,
            "n_var": int(n_var.value), "n_con": int(n_con)}
