"""ctypes bindings for the native host engine (native/plonk_native.cpp).

Builds the shared library on first use with g++ (the toolchain is part of
the image; no pybind11). All functions fall back to raising ImportError if
the toolchain is unavailable — callers (tests) skip in that case.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _build_and_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, "native", "plonk_native.cpp")
    out_dir = os.path.join(root, "native", "build")
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libplonk_native.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so, src], check=True)
    lib = ctypes.CDLL(so)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.ntt_u32.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint32,
                            ctypes.c_uint32, ctypes.c_int]
    lib.poly_mul_school.argtypes = [u32p, ctypes.c_uint64, u32p,
                                    ctypes.c_uint64, ctypes.c_uint32, u32p]
    lib.ec_msm_naive.argtypes = [u32p, u32p, u8p, u32p, ctypes.c_uint64,
                                 ctypes.c_uint32, u32p]
    lib.ec_mul_table.argtypes = [ctypes.c_uint32, ctypes.c_uint32,
                                 ctypes.c_uint64, ctypes.c_uint32, u32p,
                                 u32p, u8p]
    lib.square_chain_witness.argtypes = [ctypes.c_uint32, ctypes.c_uint64,
                                         ctypes.c_uint32, u32p, u32p, u32p]
    lib.powmod_u32.argtypes = [ctypes.c_uint32, ctypes.c_uint64,
                               ctypes.c_uint32]
    lib.powmod_u32.restype = ctypes.c_uint32
    _LIB = lib
    return lib


def _u32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def ntt(data: np.ndarray, p: int, w: int, inverse: bool = False
        ) -> np.ndarray:
    lib = _build_and_load()
    out = np.ascontiguousarray(data, dtype=np.uint32).copy()
    lib.ntt_u32(_u32ptr(out), len(out), p, w, int(inverse))
    return out


def poly_mul(a: np.ndarray, b: np.ndarray, p: int) -> np.ndarray:
    lib = _build_and_load()
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    out = np.zeros(len(a) + len(b) - 1, dtype=np.uint32)
    lib.poly_mul_school(_u32ptr(a), len(a), _u32ptr(b), len(b), p,
                        _u32ptr(out))
    return out


def ec_msm_naive(xs, ys, infs, scalars, p: int):
    lib = _build_and_load()
    xs = np.ascontiguousarray(xs, dtype=np.uint32)
    ys = np.ascontiguousarray(ys, dtype=np.uint32)
    infs = np.ascontiguousarray(infs, dtype=np.uint8)
    scalars = np.ascontiguousarray(scalars, dtype=np.uint32)
    out = np.zeros(3, dtype=np.uint32)
    lib.ec_msm_naive(_u32ptr(xs), _u32ptr(ys), _u8ptr(infs),
                     _u32ptr(scalars), len(xs), p, _u32ptr(out))
    return int(out[0]), int(out[1]), bool(out[2])


def ec_mul_table(gx: int, gy: int, count: int, p: int):
    lib = _build_and_load()
    x = np.zeros(count, dtype=np.uint32)
    y = np.zeros(count, dtype=np.uint32)
    inf = np.zeros(count, dtype=np.uint8)
    lib.ec_mul_table(gx, gy, count, p, _u32ptr(x), _u32ptr(y), _u8ptr(inf))
    return x, y, inf


def square_chain_witness(x0: int, n: int, p: int):
    lib = _build_and_load()
    a = np.zeros(n, dtype=np.uint32)
    b = np.zeros(n, dtype=np.uint32)
    c = np.zeros(n, dtype=np.uint32)
    lib.square_chain_witness(x0, n, p, _u32ptr(a), _u32ptr(b), _u32ptr(c))
    return a, b, c


def powmod(base: int, e: int, p: int) -> int:
    lib = _build_and_load()
    return int(lib.powmod_u32(base, e, p))
