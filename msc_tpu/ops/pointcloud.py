"""Point-cloud preprocessing kernels.

TPU-native (static-shape, mask-based) equivalents of the reference's
boolean-indexing NumPy filters:

- range/height filter: `src/agents/content_transform/lidar_agent.py:103-112`
- ground segmentation:  `src/agents/content_transform/lidar_agent.py:114-132`

The reference materializes filtered copies; on TPU we keep one padded
(P, 4) buffer and compute masks, so every downstream op (clustering, BEV
rasterization, feature extraction) is a single fused XLA program with no
host round-trips or dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pad_point_cloud(pc: np.ndarray, max_points: int) -> Tuple[np.ndarray, int]:
    """Pad/truncate an (N, 4) cloud to (max_points, 4).

    Padding rows are zeros; callers must combine with the returned count.
    Host-side helper (runs once per sample at ingest).
    """
    n = min(len(pc), max_points)
    out = np.zeros((max_points, 4), dtype=np.float32)
    out[:n] = pc[:n]
    return out, n


@functools.partial(jax.jit, static_argnames=())
def filter_and_segment(
    pc: jax.Array,
    n_valid: jax.Array,
    min_range: float = 1.0,
    max_range: float = 50.0,
    min_z: float = -3.0,
    max_z: float = 5.0,
    ground_z: float = -1.4,
):
    """Fused range/height filter + ground split.

    Args:
        pc: (P, 4) padded point cloud [x, y, z, intensity].
        n_valid: scalar int, number of real rows in ``pc``.

    Returns dict of masks/stats, all shapes static:
        valid:  (P,) bool — passes range+height filter
        ground: (P,) bool — valid and z < ground_z
        object: (P,) bool — valid and z >= ground_z
        n_valid/n_ground/n_object: scalar int32 counts
    """
    idx = jnp.arange(pc.shape[0])
    in_buffer = idx < n_valid
    xy_dist = jnp.hypot(pc[:, 0], pc[:, 1])
    z = pc[:, 2]
    valid = (
        in_buffer
        & (xy_dist > min_range)
        & (xy_dist < max_range)
        & (z < max_z)
        & (z > min_z)
    )
    ground = valid & (z < ground_z)
    obj = valid & ~ground
    return {
        "valid": valid,
        "ground": ground,
        "object": obj,
        "n_valid": valid.sum(dtype=jnp.int32),
        "n_ground": ground.sum(dtype=jnp.int32),
        "n_object": obj.sum(dtype=jnp.int32),
    }


def filter_and_segment_reference(pc: np.ndarray, *, min_range=1.0, max_range=50.0,
                                 min_z=-3.0, max_z=5.0, ground_z=-1.4):
    """NumPy golden model with the reference's exact copy-out semantics
    (`lidar_agent.py:103-132`); used only by tests."""
    d = np.sqrt(pc[:, 0] ** 2 + pc[:, 1] ** 2)
    keep = (d > min_range) & (d < max_range) & (pc[:, 2] < max_z) & (pc[:, 2] > min_z)
    kept = pc[keep]
    ground_mask = kept[:, 2] < ground_z
    return kept[ground_mask], kept[~ground_mask]
