"""Native (C++) host components.

The reference has no in-repo native code — its host performance comes from
external C libraries plus process pools (SURVEY.md §2.9). On this 1-CPU host
the augmentation spatial warp is the training input bottleneck, so it is
reimplemented in C++ (resample.cpp) and built here at first use with the
system g++. Falls back gracefully (native_available() -> False) when no
compiler is present; callers then use scipy.
"""
import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "resample.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(tempfile.gettempdir(),
                           f"e2enet_native_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".build{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", tmp, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except Exception:  # noqa: BLE001 — no compiler / failed build
            return None
    lib = ctypes.CDLL(so_path)
    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.affine_warp_f32.argtypes = [
        fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        dp, dp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float]
    lib.affine_warp_f32.restype = None
    lib.affine_warp_seg_f32.argtypes = [
        fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        dp, dp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float]
    lib.affine_warp_seg_f32.restype = None
    return lib


def native_available() -> bool:
    global _lib, _tried
    if os.environ.get("E2ENET_NO_NATIVE"):
        return False
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib is not None


def _cptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def affine_warp(vol: np.ndarray, M: np.ndarray, offset: np.ndarray,
                out_shape, order: int, cval: float = 0.0) -> np.ndarray:
    """scipy.ndimage.affine_transform semantics (input = M@out + offset,
    constant boundary) on (C, D, H, W) or (D, H, W) float32. order 3 is
    Keys cubic convolution (unfiltered), not scipy's B-spline — equivalent
    interpolant family for augmentation purposes."""
    assert native_available()
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    vol = np.ascontiguousarray(vol, np.float32)
    M = np.ascontiguousarray(M, np.float64).reshape(9)
    offset = np.ascontiguousarray(offset, np.float64).reshape(3)
    C, D, H, W = vol.shape
    out = np.empty((C, *out_shape), np.float32)
    _lib.affine_warp_f32(
        _cptr(vol, ctypes.c_float), C, D, H, W,
        _cptr(M, ctypes.c_double), _cptr(offset, ctypes.c_double),
        _cptr(out, ctypes.c_float),
        int(out_shape[0]), int(out_shape[1]), int(out_shape[2]),
        int(order), float(cval))
    return out[0] if squeeze else out


def affine_warp_seg(seg: np.ndarray, M: np.ndarray, offset: np.ndarray,
                    out_shape, cval: float = 0.0) -> np.ndarray:
    """Label-map warp with the reference's per-label linear + >=0.5
    threshold semantics, single pass. seg: (D, H, W) float32 labels."""
    assert native_available()
    seg = np.ascontiguousarray(seg, np.float32)
    M = np.ascontiguousarray(M, np.float64).reshape(9)
    offset = np.ascontiguousarray(offset, np.float64).reshape(3)
    D, H, W = seg.shape
    out = np.empty(tuple(out_shape), np.float32)
    _lib.affine_warp_seg_f32(
        _cptr(seg, ctypes.c_float), D, H, W,
        _cptr(M, ctypes.c_double), _cptr(offset, ctypes.c_double),
        _cptr(out, ctypes.c_float),
        int(out_shape[0]), int(out_shape[1]), int(out_shape[2]),
        float(cval))
    return out
