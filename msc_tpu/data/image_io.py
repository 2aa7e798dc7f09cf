"""Native JPEG decode (SURVEY.md section 2.2 row 1).

Replaces PIL's per-frame decode in the real-data path
(`src/nuscenes_loader.py:136-144`): libjpeg via the msc_native shared
library, with DCT-domain downscaling (scale_denom 1/2/4/8 — decode and
coarse resize fuse into one pass, the right producer for the device-side
fused resize/normalize kernel in `msc_tpu/ops/image.py`) and a threaded
batch entry point that assembles a sample's 6 camera frames in parallel.

PIL fallback everywhere, so the framework never requires the native
library (MSC_DISABLE_NATIVE=1 forces the fallback).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from msc_tpu.data.lidar_io import get_native


def native_jpeg_available() -> bool:
    lib = get_native()
    return bool(lib is not None and lib.has_jpeg())


def decode_jpeg(path: str, scale_denom: int = 1,
                max_hw: Tuple[int, int] = (960, 1664)) -> np.ndarray:
    """Decode one JPEG to an RGB uint8 array (H, W, 3).

    max_hw bounds the decode buffer (defaults sized for nuScenes' 900x1600
    frames; raise for larger sources — decodes exceeding it fall back to
    PIL)."""
    lib = get_native()
    if lib is not None and lib.has_jpeg():
        mh, mw = max_hw
        out = np.empty((mh, mw, 3), np.uint8)
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        rc = lib.decode_jpeg_file(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(h), ctypes.byref(w), mh, mw, scale_denom)
        if rc == 0:
            return out.reshape(-1)[: h.value * w.value * 3].reshape(
                h.value, w.value, 3).copy()
    return _pil_decode(path, scale_denom)


def decode_jpeg_batch(paths: List[str], scale_denom: int = 1,
                      max_hw: Tuple[int, int] = (960, 1664)
                      ) -> List[Optional[np.ndarray]]:
    """Decode several JPEGs concurrently (one thread per frame in C++).

    Returns per-path arrays (None where a decode failed and the PIL
    fallback also failed)."""
    lib = get_native()
    n = len(paths)
    if n == 0:
        return []
    if lib is not None and lib.has_jpeg():
        mh, mw = max_hw
        blob = b"\0".join(p.encode() for p in paths) + b"\0"
        out = np.empty((n, mh, mw, 3), np.uint8)
        hs = np.empty(n, np.int32)
        ws = np.empty(n, np.int32)
        lib.decode_jpeg_batch(
            blob, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mh, mw, scale_denom)
        results: List[Optional[np.ndarray]] = []
        for i in range(n):
            if hs[i] < 0:
                results.append(_pil_safe(paths[i], scale_denom))
            else:
                frame = out[i].reshape(-1)[: hs[i] * ws[i] * 3]
                results.append(frame.reshape(hs[i], ws[i], 3).copy())
        return results
    return [_pil_safe(p, scale_denom) for p in paths]


def _pil_decode(path: str, scale_denom: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    img.draft("RGB", (img.width // scale_denom, img.height // scale_denom))
    return np.asarray(img.convert("RGB"))


def _pil_safe(path: str, scale_denom: int) -> Optional[np.ndarray]:
    try:
        return _pil_decode(path, scale_denom)
    except Exception:
        return None
