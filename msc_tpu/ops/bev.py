"""Bird's-eye-view rasterization kernels.

The reference builds its BEV maps with per-point Python loops
(`src/agents/content_transform/lidar_agent.py:532-642`) — the #1 hot loop
in SURVEY.md section 3.5.  Here the whole rasterization is one fused XLA
program built from segment reductions (scatter-add / scatter-max), which
map onto TPU vector hardware; the per-scene cost drops from ~10^5 Python
iterations to a few device ops.

Layer semantics (parity with the reference):
  density: per-pixel point count -> log1p -> normalized to uint8 [0,255]
  height:  per-pixel max(z, 0), empty pixels 0
  semantic:BGR uint8; ground pixels dark blue [80,80,120], object pixels
           a yellow->red colormap over height normalized across the scene's
           object points, objects overwrite ground; finally flipped
           vertically so forward (+y) is up.

One deliberate divergence: where two object points land on one pixel the
reference keeps the *last drawn* (iteration-order dependent); we keep the
*highest* point (deterministic, order-independent).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _to_pixels(x, y, res: int, bev_range: float):
    """Pixel mapping, parity with `lidar_agent.py:547-552`."""
    xp = jnp.clip(((x + bev_range) / (2 * bev_range) * res).astype(jnp.int32), 0, res - 1)
    yp = jnp.clip(((y + bev_range) / (2 * bev_range) * res).astype(jnp.int32), 0, res - 1)
    return xp, yp


@functools.partial(jax.jit, static_argnames=("res",))
def rasterize_bev(
    pc: jax.Array,
    ground_mask: jax.Array,
    object_mask: jax.Array,
    res: int = 800,
    bev_range: float = 50.0,
) -> Dict[str, jax.Array]:
    """Rasterize density/height/semantic BEV layers in one fused program.

    Args:
        pc: (P, 4) padded cloud.
        ground_mask/object_mask: (P,) bools from ``filter_and_segment``.

    Returns:
        density:  (res, res) uint8 (log-scaled, normalized)
        height:   (res, res) float32 (max(z, 0) per pixel)
        semantic: (res, res, 3) uint8 BGR
    All layers are flipped vertically (forward = up), matching
    `lidar_agent.py:612-614`.
    """
    P = pc.shape[0]
    npix = res * res
    any_mask = ground_mask | object_mask

    xp, yp = _to_pixels(pc[:, 0], pc[:, 1], res, bev_range)
    lin = yp * res + xp
    # Invalid points go to a dump slot (index npix).
    lin_any = jnp.where(any_mask, lin, npix)
    lin_gnd = jnp.where(ground_mask, lin, npix)
    lin_obj = jnp.where(object_mask, lin, npix)

    ones = jnp.ones((P,), jnp.float32)
    z = pc[:, 2]

    # --- density + height (all valid points) ---
    density = jax.ops.segment_sum(ones, lin_any, num_segments=npix + 1)[:npix]
    hmax = jax.ops.segment_max(
        jnp.where(any_mask, z, -jnp.inf), lin_any, num_segments=npix + 1
    )[:npix]
    height = jnp.maximum(hmax, 0.0).reshape(res, res)

    logd = jnp.log1p(density)
    dmax = logd.max()
    density_u8 = jnp.where(
        dmax > 0, logd / jnp.maximum(dmax, 1e-9) * 255.0, logd
    ).astype(jnp.uint8).reshape(res, res)

    # --- semantic layer ---
    # Height normalization over the scene's object points
    # (`lidar_agent.py:578-582`).
    zmin = jnp.min(jnp.where(object_mask, z, jnp.inf))
    zmax = jnp.max(jnp.where(object_mask, z, -jnp.inf))
    span = zmax - zmin
    norm_h = jnp.where(span > 0, (z - zmin) / jnp.maximum(span, 1e-9), 0.5)

    # Per-pixel: keep the highest object point's normalized height.
    pix_h = jax.ops.segment_max(
        jnp.where(object_mask, norm_h, -jnp.inf), lin_obj, num_segments=npix + 1
    )[:npix]
    has_obj = (pix_h > -jnp.inf).reshape(res, res)
    pix_h = jnp.clip(pix_h, 0.0, 1.0).reshape(res, res)

    gnd_cnt = jax.ops.segment_sum(ones, lin_gnd, num_segments=npix + 1)[:npix]
    has_gnd = (gnd_cnt > 0).reshape(res, res)

    # Hot colormap (`lidar_agent.py:584-597`): yellow (low) -> red (high).
    g_val = jnp.where(
        pix_h < 0.5,
        255.0 * (1.0 - pix_h * 2.0),
        255.0 * (1.0 - (pix_h - 0.5) * 2.0),
    ).astype(jnp.uint8)
    zeros = jnp.zeros((res, res), jnp.uint8)
    full = jnp.full((res, res), 255, jnp.uint8)
    obj_bgr = jnp.stack([zeros, g_val, full], axis=-1)  # B, G, R

    gnd_bgr = jnp.broadcast_to(
        jnp.array([80, 80, 120], jnp.uint8), (res, res, 3)
    )
    semantic = jnp.where(
        has_obj[..., None], obj_bgr,
        jnp.where(has_gnd[..., None], gnd_bgr, jnp.zeros((res, res, 3), jnp.uint8)),
    )

    # Flip so forward is up (`lidar_agent.py:612-614`).
    return {
        "density": density_u8[::-1],
        "height": height[::-1],
        "semantic": semantic[::-1],
    }


def decorate_semantic_bev(semantic: np.ndarray, res: int = 800,
                          bev_range: float = 50.0) -> np.ndarray:
    """Host-side decoration: ego cross, distance rings, cardinal labels
    (`lidar_agent.py:599-634`).  Fixed-cost drawing; not a hot loop."""
    import cv2

    img = np.array(semantic, copy=True)  # device_get buffers are readonly
    center = res // 2
    m = 15
    cv2.line(img, (center - m, center), (center + m, center), (0, 255, 0), 3)
    cv2.line(img, (center, center - m), (center, center + m), (0, 255, 0), 3)
    for dist in (10, 20, 30, 40):
        radius = int(dist / (2 * bev_range) * res)
        cv2.circle(img, (center, center), radius, (100, 100, 100), 1)
        cv2.putText(img, f"{dist}m", (center + 5, center - radius + 15),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.4, (150, 150, 150), 1)
    cv2.putText(img, "FRONT", (center - 25, 20),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (200, 200, 200), 2)
    cv2.putText(img, "BACK", (center - 20, res - 10),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (200, 200, 200), 2)
    cv2.putText(img, "L", (10, center + 5),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (200, 200, 200), 2)
    cv2.putText(img, "R", (res - 20, center + 5),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (200, 200, 200), 2)
    return img


def rasterize_bev_reference(ground: np.ndarray, objects: np.ndarray,
                            res: int = 800, bev_range: float = 50.0):
    """NumPy golden model of the reference's per-point loops
    (`lidar_agent.py:532-614`, markers/flip excluded where noted); tests only.

    Returns (density_u8, height, semantic) pre-decoration, post-flip."""
    height = np.zeros((res, res), np.float32)
    density = np.zeros((res, res), np.float32)

    def to_pix(c):
        xp = np.clip(((c[:, 0] + bev_range) / (2 * bev_range) * res).astype(int), 0, res - 1)
        yp = np.clip(((c[:, 1] + bev_range) / (2 * bev_range) * res).astype(int), 0, res - 1)
        return xp, yp

    allp = np.vstack([ground, objects]) if len(ground) or len(objects) else np.zeros((0, 4))
    xp, yp = to_pix(allp)
    for x, y, z in zip(xp, yp, allp[:, 2]):
        density[y, x] += 1
        height[y, x] = max(height[y, x], z)
    density = np.log1p(density)
    density = ((density / density.max() * 255).astype(np.uint8)
               if density.max() > 0 else density.astype(np.uint8))

    semantic = np.zeros((res, res, 3), np.uint8)
    gx, gy = to_pix(ground)
    semantic[gy, gx] = [80, 80, 120]
    ox, oy = to_pix(objects)
    zs = objects[:, 2]
    if len(zs) and zs.max() > zs.min():
        nh = (zs - zs.min()) / (zs.max() - zs.min())
    else:
        nh = np.ones(len(zs)) * 0.5
    # Divergence note: golden model uses max-height-wins per pixel to match
    # the deterministic TPU kernel (reference is last-write-wins).
    order = np.argsort(nh)
    for x, y, h in zip(ox[order], oy[order], nh[order]):
        if h < 0.5:
            g = int(255 * (1 - h * 2))
        else:
            g = int(255 * (1 - (h - 0.5) * 2))
        semantic[y, x] = [0, g, 255]
    return density[::-1], height[::-1], semantic[::-1]
