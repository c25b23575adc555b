"""ctypes bindings for the native preprocessing core (preprocess.cpp).

Builds the shared library with g++ on first use (cached next to the source);
falls back gracefully (``available() == False``) when no compiler exists, in
which case callers use the pure-JAX path in data/image_processing.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB = os.path.join(_HERE, "libcullavo_preprocess.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.native_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def preprocess_batch(images: list, size: int = 336,
                     mean=(0.48145466, 0.4578275, 0.40821073),
                     std=(0.26862954, 0.26130258, 0.27577711),
                     num_threads: int = 0) -> np.ndarray:
    """list of [H, W, 3] uint8 → [N, 3, size, size] fp32 CLIP-normalized."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocess library unavailable (no g++?)")
    n = len(images)
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data_as(ctypes.c_void_p).value
                                   for im in imgs])
    hs = (ctypes.c_int * n)(*[im.shape[0] for im in imgs])
    ws = (ctypes.c_int * n)(*[im.shape[1] for im in imgs])
    out = np.empty((n, 3, size, size), np.float32)
    mean_arr = (ctypes.c_float * 3)(*mean)
    std_arr = (ctypes.c_float * 3)(*std)
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    lib.preprocess_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), hs, ws,
        n, size, mean_arr, std_arr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    return out


_NF4_SRC = os.path.join(_HERE, "nf4quant.cpp")
_NF4_LIB = os.path.join(_HERE, "libcullavo_nf4.so")
_nf4_lib = None
_nf4_tried = False


def _load_nf4():
    global _nf4_lib, _nf4_tried
    with _lock:
        if _nf4_lib is not None or _nf4_tried:
            return _nf4_lib
        _nf4_tried = True
        if (not os.path.exists(_NF4_LIB)
                or os.path.getmtime(_NF4_LIB) < os.path.getmtime(_NF4_SRC)):
            try:
                subprocess.run(["g++", "-O3", "-march=native", "-shared",
                                "-fPIC", "-std=c++17", "-o", _NF4_LIB, _NF4_SRC],
                               check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
        lib = ctypes.CDLL(_NF4_LIB)
        lib.nf4_quantize_planar.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _nf4_lib = lib
        return _nf4_lib


def nf4_quantize_planar_native(w: np.ndarray, num_threads: int = 0) -> dict:
    """[..., K, N] fp32 → planar NF4 dict ({"q4p", "scale"}), C++ core."""
    lib = _load_nf4()
    if lib is None:
        raise RuntimeError("native nf4 quantizer unavailable (no g++?)")
    w = np.ascontiguousarray(w, np.float32)
    *lead, K, N = w.shape
    L = int(np.prod(lead)) if lead else 1
    words = np.empty((L, K // 8, N), np.int32)
    scale = np.empty((L, K, N // 64), np.float32)
    if num_threads <= 0:
        num_threads = min(max(L, 1), os.cpu_count() or 1)
    lib.nf4_quantize_planar(
        w.reshape(L, K, N).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        L, K, N,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads)
    return {"q4p": words.reshape(tuple(lead) + (K // 8, N)),
            "scale": scale.reshape(tuple(lead) + (K, N // 64))}
