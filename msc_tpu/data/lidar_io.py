"""Native LiDAR IO + host clustering bindings.

Wraps ``msc_tpu/data/native/msc_native.cpp`` (mmap .bin reader + exact
grid-DBSCAN) via ctypes, compiling it lazily with g++ into a cached shared
library.  Every entry point has a NumPy fallback so the framework works on
machines without a toolchain.

Reference counterparts: `src/nuscenes_loader.py:146-157` (devkit
LidarPointCloud.from_file) and `src/agents/content_transform/
lidar_agent.py:148-151` (sklearn DBSCAN).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_SRC = _NATIVE_DIR / "msc_native.cpp"
_LIB_PATH = _NATIVE_DIR / "libmsc_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    """Compile the native library if needed and load it."""
    global _build_failed
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
        return ctypes.CDLL(str(_LIB_PATH))
    base = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(_LIB_PATH)]
    # -ljpeg enables the native JPEG decode path; retry without it on
    # systems lacking libjpeg (the C++ stubs take over via __has_include)
    for cmd in (base + ["-ljpeg", "-lpthread"], base + ["-lpthread"]):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return ctypes.CDLL(str(_LIB_PATH))
        except Exception:
            continue
    _build_failed = True
    return None


def get_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("MSC_DISABLE_NATIVE"):
        return None
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.read_lidar_f32.restype = ctypes.c_int64
                lib.read_lidar_f32.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                ]
                lib.dbscan.restype = ctypes.c_int32
                lib.dbscan.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                    ctypes.c_float,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32),
                ]
                u8p = ctypes.POINTER(ctypes.c_uint8)
                i32p = ctypes.POINTER(ctypes.c_int32)
                lib.has_jpeg.restype = ctypes.c_int32
                lib.decode_jpeg_file.restype = ctypes.c_int32
                lib.decode_jpeg_file.argtypes = [
                    ctypes.c_char_p, u8p, i32p, i32p,
                    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ]
                lib.decode_jpeg_batch.restype = ctypes.c_int32
                lib.decode_jpeg_batch.argtypes = [
                    ctypes.c_char_p, ctypes.c_int32, u8p, i32p, i32p,
                    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ]
                _lib = lib
    return _lib


def read_lidar_bin(path: str, max_points: int = 300_000) -> np.ndarray:
    """Read a nuScenes LIDAR_TOP ``.bin`` (float32 x,y,z,intensity,ring
    records) into an (N, 4) float32 array."""
    lib = get_native()
    if lib is not None:
        out = np.empty((max_points, 4), dtype=np.float32)
        n = lib.read_lidar_f32(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_points)
        if n >= 0:
            return np.ascontiguousarray(out[:n])
    # NumPy fallback
    raw = np.fromfile(path, dtype=np.float32)
    n = len(raw) // 5
    return raw[: n * 5].reshape(n, 5)[:max_points, :4].copy()


def dbscan_host(points_xyz: np.ndarray, eps: float, min_samples: int) -> Tuple[np.ndarray, int]:
    """Exact DBSCAN on the host.

    Uses the native grid implementation when available; otherwise falls
    back to a pure-NumPy grid DBSCAN (same algorithm, slower).

    Returns (labels, num_clusters) with labels of shape (N,), -1 = noise.
    """
    pts = np.ascontiguousarray(points_xyz[:, :3], dtype=np.float32)
    n = len(pts)
    if n == 0:
        return np.empty(0, dtype=np.int32), 0
    lib = get_native()
    if lib is not None:
        labels = np.empty(n, dtype=np.int32)
        k = lib.dbscan(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(eps), min_samples,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return labels, int(k)
    return _dbscan_numpy(pts, eps, min_samples)


def _dbscan_numpy(pts: np.ndarray, eps: float, min_samples: int) -> Tuple[np.ndarray, int]:
    """Pure-NumPy grid DBSCAN fallback (exact, O(N * avg-neighborhood))."""
    n = len(pts)
    inv = 1.0 / eps
    cells = np.floor(pts * inv).astype(np.int64)
    # Map cell -> point indices
    from collections import defaultdict

    grid = defaultdict(list)
    for i, c in enumerate(map(tuple, cells)):
        grid[c].append(i)

    eps2 = eps * eps

    def neighbors(i: int):
        cx, cy, cz = cells[i]
        out = []
        p = pts[i]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    bucket = grid.get((cx + dx, cy + dy, cz + dz))
                    if not bucket:
                        continue
                    cand = np.asarray(bucket)
                    d = pts[cand] - p
                    m = (d * d).sum(axis=1) <= eps2
                    out.extend(cand[m].tolist())
        return out

    labels = np.full(n, -2, dtype=np.int32)
    cluster = 0
    for i in range(n):
        if labels[i] != -2:
            continue
        nbrs = neighbors(i)
        if len(nbrs) < min_samples:
            labels[i] = -1
            continue
        cid = cluster
        cluster += 1
        labels[i] = cid
        seeds = list(nbrs)
        s = 0
        while s < len(seeds):
            q = seeds[s]
            s += 1
            if labels[q] == -1:
                labels[q] = cid
            if labels[q] != -2:
                continue
            labels[q] = cid
            qn = neighbors(q)
            if len(qn) >= min_samples:
                seeds.extend(qn)
    return labels, cluster
