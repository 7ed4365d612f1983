"""ctypes bindings for the native host kernels (native/tpu_unet_native.cc).

Builds on demand with the system g++ (pybind11 is unavailable here; the C ABI
+ ctypes keeps the binding dependency-free). Every entry point has a pure
NumPy/JAX fallback, so the framework works without a compiler — the native
path accelerates host ingest (GT preprocessing over whole datasets) and acts
as a cv2-independent oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtpu_unet_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "tpu_unet_native.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.edt_l2.argtypes = [u8, ctypes.c_int, ctypes.c_int, f32]
        lib.edt_l2.restype = None
        lib.connected_components4.argtypes = [u8, ctypes.c_int, ctypes.c_int, i32]
        lib.connected_components4.restype = ctypes.c_int
        lib.dilate_rect.argtypes = [f32, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int, f32]
        lib.dilate_rect.restype = None
        lib.preprocess_gt.argtypes = [i32, ctypes.c_int, ctypes.c_int, f32, f32]
        lib.preprocess_gt.restype = None
        _lib = lib
        return _lib


def has_native() -> bool:
    return _load() is not None


def edt(mask: np.ndarray) -> np.ndarray:
    """Exact EDT to the nearest True pixel ([H, W] bool -> [H, W] f32)."""
    lib = _load()
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    if lib is None:
        import jax.numpy as jnp

        from tpu_unet.ops.edt import edt as edt_jax

        return np.asarray(edt_jax(jnp.asarray(mask.astype(bool))))
    out = np.empty((h, w), np.float32)
    lib.edt_l2(m, h, w, out)
    return out


def connected_components(fg: np.ndarray) -> Tuple[int, np.ndarray]:
    """(num_components, labels [H, W] int32 with 0 = background, 1..K =
    components in first-pixel order) — cv.connectedComponents-compatible."""
    lib = _load()
    m = np.ascontiguousarray(fg, np.uint8)
    h, w = m.shape
    if lib is None:
        import jax.numpy as jnp

        from tpu_unet.ops.cc import connected_components as cc_jax

        lab = np.asarray(cc_jax(jnp.asarray(fg.astype(bool))))
        # relabel in first-pixel (row-major) order like cv2
        out = np.zeros((h, w), np.int32)
        seen = {}
        k = 0
        for y in range(h):
            for x in range(w):
                v = lab[y, x]
                if v >= 2 ** 30:
                    continue
                if v not in seen:
                    k += 1
                    seen[v] = k
                out[y, x] = seen[v]
        return k, out
    out = np.empty((h, w), np.int32)
    k = lib.connected_components4(m, h, w, out)
    return k, out


def dilate(img: np.ndarray, ksize: int = 5, iterations: int = 1) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(img, np.float32)
    h, w = x.shape
    if lib is None:
        from tpu_unet.data.ingest import _maximum_filter

        out = x
        for _ in range(iterations):
            out = _maximum_filter(out, ksize)
        return out
    out = np.empty((h, w), np.float32)
    lib.dilate_rect(x, h, w, ksize, iterations, out)
    return out


def preprocess_gt(instances: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Native separating-border GT preprocessing ([H, W] instance ids ->
    (gt f32, edge f32)); falls back to data.ingest.preprocess_gt."""
    lib = _load()
    if lib is None:
        from tpu_unet.data.ingest import _preprocess_gt_py

        gt, edge = _preprocess_gt_py(instances)
        return gt.astype(np.float32), edge.astype(np.float32)
    x = np.ascontiguousarray(instances, np.int32)
    h, w = x.shape
    gt = np.empty((h, w), np.float32)
    edge = np.empty((h, w), np.float32)
    lib.preprocess_gt(x, h, w, gt, edge)
    return gt, edge
