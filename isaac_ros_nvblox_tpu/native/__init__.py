"""ctypes bindings for the native mesh post-processing library.

The library (native/mesh_native.cc) is built on demand with `make` and
loaded via ctypes; every entry point has a numpy fallback so the framework
works without a compiler. Role parity: the reference's host-side mesh
serialization path is C++ (mesh_conversions.cpp, layer_publishing.cpp).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libnvblox_tpu_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.count_valid.restype = ctypes.c_int64
        lib.compact_triangles.restype = ctypes.c_int64
        lib.weld_mesh.restype = ctypes.c_int64
        lib.write_mesh_ply.restype = ctypes.c_int
        lib.mesh_block_offsets.restype = None
        lib.mesh_block_compact.restype = None
        _lib = lib
    except (OSError, subprocess.SubprocessError) as e:
        log.warning("native mesh library unavailable (%s); using numpy", e)
        _lib = None
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def have_native() -> bool:
    return _load() is not None


def compact_triangles(verts: np.ndarray, colors: np.ndarray,
                      valid: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pack valid triangles: ([T,3,3] f32, [T,3,3] f32, [T] bool-ish) ->
    ([K,3,3], [K,3,3])."""
    verts = np.ascontiguousarray(verts.reshape(-1, 3, 3), np.float32)
    colors = np.ascontiguousarray(colors.reshape(-1, 3, 3), np.float32)
    valid = np.ascontiguousarray(valid.reshape(-1).astype(np.uint8))
    lib = _load()
    if lib is None:
        m = valid.astype(bool)
        return verts[m], colors[m]
    n = verts.shape[0]
    k = lib.count_valid(_ptr(valid, ctypes.c_uint8), ctypes.c_int64(n))
    out_v = np.empty((k, 3, 3), np.float32)
    out_c = np.empty((k, 3, 3), np.float32)
    lib.compact_triangles(
        _ptr(verts, ctypes.c_float), _ptr(colors, ctypes.c_float),
        _ptr(valid, ctypes.c_uint8), ctypes.c_int64(n),
        _ptr(out_v, ctypes.c_float), _ptr(out_c, ctypes.c_float))
    return out_v, out_c


def compact_mesh_blocks(verts: np.ndarray, colors: Optional[np.ndarray],
                        mask: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray,
                                   Optional[np.ndarray]]:
    """Per-block CSR compaction of device triangle soup.

    verts: f32[N, 3, K, V] xyz-major components; colors: same or None;
    mask: bool/u8[N, K, V]. Returns (offsets i64[N+1], verts f32[total, 3],
    colors f32[total, 3] | None) with block i's vertices at
    [offsets[i]:offsets[i+1]] in the same v-major order as the numpy path.
    """
    verts = np.ascontiguousarray(verts, np.float32)
    mask_u8 = np.ascontiguousarray(mask.astype(np.uint8))
    N, K, V = mask_u8.shape
    lib = _load()
    if lib is None:
        # v-major order: transpose (K, V) -> (V, K) before flattening.
        m = mask_u8.transpose(0, 2, 1).reshape(N, -1).astype(bool)
        offsets = np.zeros(N + 1, np.int64)
        np.cumsum(m.sum(1), out=offsets[1:])
        pts = verts.transpose(0, 3, 2, 1).reshape(N, -1, 3)  # [N, V*K, 3]
        out_v = pts[m]
        out_c = None
        if colors is not None:
            cols = np.ascontiguousarray(colors, np.float32)
            out_c = cols.transpose(0, 3, 2, 1).reshape(N, -1, 3)[m]
        return offsets, out_v, out_c
    offsets = np.empty(N + 1, np.int64)
    lib.mesh_block_offsets(_ptr(mask_u8, ctypes.c_uint8),
                           ctypes.c_int64(N), ctypes.c_int64(K),
                           ctypes.c_int64(V), _ptr(offsets, ctypes.c_int64))
    total = int(offsets[-1])
    out_v = np.empty((total, 3), np.float32)
    has_c = colors is not None
    out_c = np.empty((total, 3), np.float32) if has_c else None
    cols = (np.ascontiguousarray(colors, np.float32) if has_c
            else np.zeros((1,), np.float32))
    lib.mesh_block_compact(
        _ptr(verts, ctypes.c_float),
        _ptr(cols, ctypes.c_float) if has_c else None,
        _ptr(mask_u8, ctypes.c_uint8), ctypes.c_int64(N), ctypes.c_int64(K),
        ctypes.c_int64(V), _ptr(offsets, ctypes.c_int64),
        _ptr(out_v, ctypes.c_float),
        _ptr(out_c, ctypes.c_float) if has_c else
        _ptr(np.zeros((1,), np.float32), ctypes.c_float))
    return offsets, out_v, out_c


def weld_mesh(verts: np.ndarray, colors: np.ndarray, quantum: float
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Weld a triangle soup [T,3,3] -> (verts [V,3] f32, colors [V,3] u8,
    tris [T,3] i32)."""
    verts = np.ascontiguousarray(verts.reshape(-1, 3, 3), np.float32)
    colors = np.ascontiguousarray(colors.reshape(-1, 3, 3), np.float32)
    t = verts.shape[0]
    lib = _load()
    if lib is None:
        flat_v = verts.reshape(-1, 3)
        flat_c = colors.reshape(-1, 3)
        q = np.round(flat_v / quantum).astype(np.int64)
        _, first, inv = np.unique(q, axis=0, return_index=True,
                                  return_inverse=True)
        return (flat_v[first],
                np.clip(flat_c[first], 0, 255).astype(np.uint8),
                inv.reshape(-1, 3).astype(np.int32))
    out_v = np.empty((t * 3, 3), np.float32)
    out_c = np.empty((t * 3, 3), np.uint8)
    out_t = np.empty((t, 3), np.int32)
    v = lib.weld_mesh(
        _ptr(verts, ctypes.c_float), _ptr(colors, ctypes.c_float),
        ctypes.c_int64(t), ctypes.c_float(quantum),
        _ptr(out_v, ctypes.c_float), _ptr(out_c, ctypes.c_uint8),
        _ptr(out_t, ctypes.c_int32))
    return out_v[:v].copy(), out_c[:v].copy(), out_t


def write_mesh_ply(path, verts: np.ndarray, colors: Optional[np.ndarray],
                   tris: np.ndarray) -> bool:
    """Binary PLY via C++ (falls back to io/ply.py's numpy writer)."""
    lib = _load()
    if lib is None:
        from isaac_ros_nvblox_tpu.io.ply import write_mesh_ply as py_write
        py_write(path, verts, tris, colors)
        return True
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    has_c = colors is not None and len(colors) == len(verts)
    colors_arr = (np.ascontiguousarray(colors, np.uint8) if has_c
                  else np.zeros((1, 3), np.uint8))
    rc = lib.write_mesh_ply(
        str(path).encode(), _ptr(verts, ctypes.c_float),
        _ptr(colors_arr, ctypes.c_uint8), ctypes.c_int64(len(verts)),
        _ptr(tris, ctypes.c_int32), ctypes.c_int64(len(tris)),
        ctypes.c_int(1 if has_c else 0))
    return rc == 0
