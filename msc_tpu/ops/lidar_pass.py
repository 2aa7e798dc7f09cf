"""Fused single-dispatch LiDAR device pass.

filter/ground-split + BEV rasterization + voxel clustering compiled as ONE
XLA program: over the tunnel every jitted call is an RPC round trip, so the
agent's three dispatches (plus their intermediate HBM traffic) fuse into a
single call returning everything the host needs.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax

from msc_tpu.ops.bev import rasterize_bev
from msc_tpu.ops.clustering import voxel_cluster
from msc_tpu.ops.pointcloud import filter_and_segment


@functools.partial(
    jax.jit,
    static_argnames=("min_range", "max_range", "min_z", "max_z", "ground_z",
                     "eps", "min_samples", "min_cluster_points",
                     "bev_resolution", "bev_range", "max_clusters"),
)
def lidar_device_pass(
    pc: jax.Array,
    n_valid,
    *,
    min_range: float = 1.0,
    max_range: float = 50.0,
    min_z: float = -3.0,
    max_z: float = 5.0,
    ground_z: float = -1.4,
    eps: float = 0.5,
    min_samples: int = 10,
    min_cluster_points: int = 5,
    bev_resolution: int = 800,
    bev_range: float = 50.0,
    max_clusters: int = 128,
) -> Dict[str, jax.Array]:
    masks = filter_and_segment(
        pc, n_valid, min_range=min_range, max_range=max_range,
        min_z=min_z, max_z=max_z, ground_z=ground_z)
    bev = rasterize_bev(pc, masks["ground"], masks["object"],
                        res=bev_resolution, bev_range=bev_range)
    clusters = voxel_cluster(
        pc, masks["object"], eps=eps, min_samples=min_samples,
        min_cluster_points=min_cluster_points, bev_range=bev_range,
        z_min=min_z, z_max=max_z, max_clusters=max_clusters)
    return {
        "n_ground": masks["n_ground"],
        "n_object": masks["n_object"],
        "bev_density": bev["density"],
        "bev_height": bev["height"],
        "bev_semantic": bev["semantic"],
        **{f"cl_{k}": v for k, v in clusters.items()},
    }
