"""Batched cluster multi-view point splatting.

Replaces the reference's per-point ``cv2.circle`` loops
(`src/agents/content_transform/lidar_agent.py:241-356` — hot loop #2 in
SURVEY.md section 3.5) with one vectorized scatter program that renders
ALL clusters' 2x2 view grids (top XY / side XZ / front YZ / isometric) in
a single device call.

Parity notes vs the reference renderer:
- same per-cluster centering, common scale = 0.35*img_size/max_extent,
  radius-2 point discs, intensity-normalized grayscale on white;
- overlapping points keep the max intensity (reference: draw-order wins);
- axis glyphs / titles are host-side decoration (``decorate_views``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _render_views_single(points: jax.Array, mask: jax.Array,
                         img_size: int) -> jax.Array:
    """Render one cluster's 2x2 view grid.

    Args:
        points: (P, 4) padded cluster points.
        mask: (P,) bool validity.

    Returns (2*img_size, 2*img_size) uint8 grayscale (255 = background).
    """
    P = points.shape[0]
    S = img_size
    xyz = points[:, :3]
    cnt = jnp.maximum(mask.sum(), 1)
    center = (xyz * mask[:, None]).sum(0) / cnt
    c = xyz - center

    def rng(a):
        hi = jnp.max(jnp.where(mask, a, -jnp.inf))
        lo = jnp.min(jnp.where(mask, a, jnp.inf))
        return hi - lo

    max_range = jnp.maximum(jnp.maximum(rng(c[:, 0]), rng(c[:, 1])), rng(c[:, 2]))
    scale = jnp.where(max_range > 0, (S * 0.35) / jnp.maximum(max_range, 1e-6), 1.0)

    inten = points[:, 3]
    imin = jnp.min(jnp.where(mask, inten, jnp.inf))
    imax = jnp.max(jnp.where(mask, inten, -jnp.inf))
    gray = ((inten - imin) / (imax - imin + 1e-6) * 255.0)
    gray = jnp.where(mask, gray, 0.0)

    # Isometric rotation (30 deg about x then y), `lidar_agent.py:321-332`.
    a = jnp.pi / 6
    ca, sa = jnp.cos(a), jnp.sin(a)
    rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], jnp.float32)
    ry = jnp.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], jnp.float32)
    rot = c @ rx.T @ ry.T
    iso_u = (rot[:, 0] + rot[:, 1] * 0.5)
    iso_v = (rot[:, 2] - rot[:, 1] * 0.5)

    # (view, axis-u coords, axis-v coords, quadrant offsets)
    views = [
        (c[:, 0], c[:, 1], 0, 0),   # top  (XY) -> top-left
        (c[:, 0], c[:, 2], 1, 0),   # side (XZ) -> top-right
        (c[:, 1], c[:, 2], 0, 1),   # front(YZ) -> bottom-left
        (iso_u, iso_v, 1, 1),       # iso       -> bottom-right
    ]

    npix = (2 * S) * (2 * S)
    # Radius-2 disc stencil (matches cv2.circle(..., 2, ..., -1)).
    offs = [(dx, dy) for dx in range(-2, 3) for dy in range(-2, 3)
            if dx * dx + dy * dy <= 4]

    lin_all = []
    val_all = []
    for u, v, qx, qy in views:
        px = (u * scale + S / 2).astype(jnp.int32)
        py = (v * scale + S / 2).astype(jnp.int32)
        inb = mask & (px >= 0) & (px < S) & (py >= 0) & (py < S)
        # flip v axis, add quadrant offset (`lidar_agent.py:293-297`).
        gx = qx * S + px
        gy = qy * S + (S - py - 1)
        for dx, dy in offs:
            ex = jnp.clip(gx + dx, qx * S, qx * S + S - 1)
            ey = jnp.clip(gy + dy, qy * S, qy * S + S - 1)
            lin = jnp.where(inb, ey * (2 * S) + ex, npix)
            lin_all.append(lin)
            val_all.append(jnp.where(inb, gray, -1.0))

    lin_cat = jnp.concatenate(lin_all)
    val_cat = jnp.concatenate(val_all)
    img = jax.ops.segment_max(val_cat, lin_cat, num_segments=npix + 1)[:npix]
    out = jnp.where(img < 0, 255.0, img)  # background white
    return out.reshape(2 * S, 2 * S).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("img_size",))
def render_cluster_views(points: jax.Array, masks: jax.Array,
                         img_size: int = 256) -> jax.Array:
    """Render all clusters at once.

    Args:
        points: (K, P, 4) padded per-cluster points.
        masks: (K, P) bool validity.

    Returns (K, 2*img_size, 2*img_size) uint8 grayscale grids.
    """
    return jax.vmap(lambda p, m: _render_views_single(p, m, img_size))(points, masks)


def gather_cluster_points(pc: np.ndarray, point_cluster: np.ndarray,
                          k: int, max_pts: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
    """Host helper: pack per-cluster point buffers for the splat kernel."""
    pts = np.zeros((k, max_pts, 4), np.float32)
    msk = np.zeros((k, max_pts), bool)
    for c in range(k):
        sel = pc[point_cluster == c][:max_pts]
        pts[c, : len(sel)] = sel
        msk[c, : len(sel)] = True
    return pts, msk


def decorate_views(img: np.ndarray, img_size: int = 256) -> np.ndarray:
    """Host-side axis glyphs + view titles (`lidar_agent.py:299-354`)."""
    import cv2

    out = cv2.cvtColor(np.ascontiguousarray(img), cv2.COLOR_GRAY2BGR)
    S = img_size
    for (qx, qy, title) in ((0, 0, "Top (XY)"), (1, 0, "Side (XZ)"),
                            (0, 1, "Front (YZ)"), (1, 1, "3D View")):
        ox, oy = qx * S, qy * S
        if title != "3D View":
            cv2.line(out, (ox + S // 2, oy + S // 2),
                     (ox + S // 2 + 30, oy + S // 2), (0, 0, 255), 2)
            cv2.line(out, (ox + S // 2, oy + S // 2),
                     (ox + S // 2, oy + S // 2 - 30), (0, 255, 0), 2)
        cv2.putText(out, title, (ox + 10, oy + 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1)
    return out


def tile_cluster_grids_device(grids: jax.Array, max_cols: int = 3) -> jax.Array:
    """Device-side tiling of K cluster grids into one (rows*H, cols*W, 3)
    image for a batched classification call.

    Stays on device end-to-end — the tile only feeds the on-TPU VLM, and
    device->host transfers are the scarcest resource on the tunnel.  The
    host version below adds cv2 numbering/axes for export artifacts.
    """
    k, h, w = grids.shape
    cols = min(max_cols, k)
    rows = -(-k // cols)
    pad = rows * cols - k
    g = jnp.pad(grids, ((0, pad), (0, 0), (0, 0)), constant_values=255)
    canvas = g.reshape(rows, cols, h, w).transpose(0, 2, 1, 3)
    canvas = canvas.reshape(rows * h, cols * w)
    return jnp.repeat(canvas[..., None], 3, axis=-1)


def tile_cluster_grids(grids: np.ndarray, max_cols: int = 3) -> np.ndarray:
    """Arrange K cluster grids into one labeled image for a batched
    classification call (`lidar_agent.py:367-386`)."""
    import cv2

    k = len(grids)
    if k == 1:
        return decorate_views(grids[0])
    cols = min(max_cols, k)
    rows = -(-k // cols)
    h, w = grids[0].shape[:2]
    canvas = np.full((rows * h, cols * w, 3), 255, np.uint8)
    for i in range(k):
        r, c = divmod(i, cols)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = decorate_views(grids[i])
        cv2.putText(canvas, f"#{i}", (c * w + 10, r * h + 50),
                    cv2.FONT_HERSHEY_SIMPLEX, 1.5, (255, 0, 0), 3)
    return canvas
