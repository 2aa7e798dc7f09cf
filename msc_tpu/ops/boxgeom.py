"""Batched 3D box / ego geometry kernels.

Device equivalents of the reference's per-annotation Python math:
- distance & 4-way direction: `src/agents/content_transform/scenegraph_agent.py:186-201`
- 8-way direction: `src/agents/content_transform/lidar_agent.py:506-530`
- quaternion boxes: annotation contract `src/nuscenes_loader.py:179-191`

Note the reference uses *two mutually inconsistent* direction conventions
(scene-graph 4-way treats +y as front; the LiDAR 8-way puts "front" at the
+x+y diagonal).  Both are reproduced exactly, separately, for behavior
parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Direction vocabularies (index -> label)
DIR4 = ("front", "left", "back", "right")
DIR8 = ("front_right", "front", "front_left", "left",
        "back_left", "back", "back_right", "right")


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternions -> (..., 3, 3) rotation matrices."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


@jax.jit
def box_corners(translation: jax.Array, size: jax.Array,
                rotation: jax.Array) -> jax.Array:
    """Batched box corners.

    Args:
        translation: (N, 3) box centers.
        size: (N, 3) [width, length, height] (nuScenes convention: w=y, l=x).
        rotation: (N, 4) wxyz quaternions.

    Returns:
        (N, 8, 3) corner coordinates.  One batched matmul -> MXU.
    """
    w, l, h = size[:, 0], size[:, 1], size[:, 2]
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-0.5, 0.5) for sy in (-0.5, 0.5)
         for sz in (-0.5, 0.5)], jnp.float32)  # (8, 3)
    local = signs[None] * jnp.stack([l, w, h], -1)[:, None, :]  # (N, 8, 3)
    R = quat_to_rotmat(rotation)  # (N, 3, 3)
    return jnp.einsum("nij,nkj->nki", R, local) + translation[:, None, :]


@jax.jit
def direction_4way(xy: jax.Array) -> jax.Array:
    """4-way direction codes (scene-graph semantics,
    `scenegraph_agent.py:190-201`): angle in [45,135) -> front,
    [135,225) -> left, [225,315) -> back, else right.  Returns (N,) int32
    indices into DIR4."""
    ang = jnp.degrees(jnp.arctan2(xy[:, 1], xy[:, 0])) % 360.0
    return jnp.where(
        (ang >= 45) & (ang < 135), 0,
        jnp.where((ang >= 135) & (ang < 225), 1,
                  jnp.where((ang >= 225) & (ang < 315), 2, 3))).astype(jnp.int32)


@jax.jit
def direction_8way(xy: jax.Array) -> jax.Array:
    """8-way direction codes (LiDAR-agent semantics,
    `lidar_agent.py:506-530`): 8 sectors of 45 deg starting at 337.5,
    ordered front_right, front, front_left, left, back_left, back,
    back_right, right.  Returns (N,) int32 indices into DIR8."""
    ang = jnp.degrees(jnp.arctan2(xy[:, 1], xy[:, 0])) % 360.0
    sector = (jnp.floor((ang + 22.5) / 45.0).astype(jnp.int32)) % 8
    return sector


@jax.jit
def ego_distance(xy: jax.Array) -> jax.Array:
    """(N, 2) -> (N,) planar distance from ego."""
    return jnp.hypot(xy[:, 0], xy[:, 1])


def direction_8way_host(x: float, y: float) -> str:
    """Host scalar version of direction_8way (same sector mapping) for
    small per-cluster loops where a jitted dispatch per item would be an
    RPC round trip."""
    ang = (np.degrees(np.arctan2(y, x))) % 360.0
    return DIR8[int(np.floor((ang + 22.5) / 45.0)) % 8]


def annotations_to_arrays(annotations) -> dict:
    """Host helper: annotation dicts -> batched arrays for the kernels."""
    n = len(annotations)
    t = np.zeros((n, 3), np.float32)
    s = np.zeros((n, 3), np.float32)
    q = np.zeros((n, 4), np.float32)
    v = np.zeros((n, 2), np.float32)
    for i, a in enumerate(annotations):
        t[i] = a["translation"]
        s[i] = a["size"]
        q[i] = a["rotation"]
        vel = a.get("velocity") or [0.0, 0.0]
        vx = vel[0] if vel[0] is not None and not np.isnan(vel[0]) else 0.0
        vy = vel[1] if len(vel) > 1 and vel[1] is not None and not np.isnan(vel[1]) else 0.0
        v[i] = (vx, vy)
    return {"translation": t, "size": s, "rotation": q, "velocity": v}
