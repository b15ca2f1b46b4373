"""ctypes bindings for the C++ OBJ IO fast path (objio.cpp).

``available()`` loads ``libobjio.so`` next to this file, building it with
g++ on first use when a compiler is present (cached). Callers fall back to
the pure-Python parser in data/objio.py when this returns False — same
semantics, different speed (measured ~3-4x faster reads on 200k-point
clouds; tests/test_native.py asserts byte-identical round-trips).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libobjio.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "objio.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.objio_read.restype = ctypes.c_int
    lib.objio_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.objio_write.restype = ctypes.c_int
    lib.objio_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.c_long,
    ]
    lib.objio_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_obj(path: str):
    lib = _load()
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_long()
    nf = ctypes.c_long()
    rc = lib.objio_read(path.encode(), ctypes.byref(vp), ctypes.byref(nv),
                        ctypes.byref(fp), ctypes.byref(nf))
    if rc != 0:
        raise IOError(f"objio_read({path!r}) failed with code {rc}")
    try:
        v = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
        f = np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy()
    finally:
        lib.objio_free(vp)
        lib.objio_free(fp)
    return v.astype(np.float32, copy=False), f.astype(np.int32, copy=False)


def write_obj(path: str, vertices, faces=None):
    lib = _load()
    v = np.ascontiguousarray(vertices, dtype=np.float32).reshape(-1, 3)
    if faces is None:
        f = np.zeros((0, 3), np.int32)
    else:
        f = np.ascontiguousarray(faces, dtype=np.int32).reshape(-1, 3)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    rc = lib.objio_write(
        path.encode(),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), f.shape[0],
    )
    if rc != 0:
        raise IOError(f"objio_write({path!r}) failed with code {rc}")
