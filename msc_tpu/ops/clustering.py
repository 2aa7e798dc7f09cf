"""On-device point clustering: voxel connected components.

TPU-native replacement for the reference's sklearn DBSCAN
(`src/agents/content_transform/lidar_agent.py:134-175`, eps=0.5 m,
min_samples=10, clusters <5 pts dropped).  DBSCAN is data-dependent and
pointer-chasing — hostile to XLA — so the device algorithm is a
*voxel-grid connected-components* with DBSCAN-style density gating:

1. Quantize points to an eps-sized dense voxel grid over the BEV range
   (static shape: (2R/eps)^2 x Z levels).
2. A voxel is *core* if the point count in its 3x3x3 neighborhood is
   >= min_samples (density criterion ~ DBSCAN's core test with the
   distance relaxed from a sphere of radius eps to the 27-voxel box).
3. Connected components over core voxels via iterative min-label
   propagation + pointer jumping (O(log diameter) sweeps, all vectorized).
4. Border voxels (occupied, non-core) adopt the label of an adjacent core
   voxel in one extra non-propagating sweep — mirrors DBSCAN border-point
   semantics without bridging clusters.
5. Clusters with fewer than ``min_cluster_points`` points are dropped
   (`lidar_agent.py:163-166`).

For well-separated objects (gap > ~2*eps) this matches DBSCAN exactly; in
dense contact regions it can merge clusters DBSCAN would split within one
voxel of slack.  The exact host fallback lives in
``msc_tpu.data.lidar_io.dbscan_host`` (C++ grid DBSCAN).

Everything below is shape-static and jit-compiled once per (P, grid) size.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=("eps", "min_samples", "min_cluster_points",
                     "bev_range", "z_min", "z_max", "max_clusters"),
)
def voxel_cluster(
    pc: jax.Array,
    object_mask: jax.Array,
    eps: float = 0.5,
    min_samples: int = 10,
    min_cluster_points: int = 5,
    bev_range: float = 50.0,
    z_min: float = -3.0,
    z_max: float = 5.0,
    max_clusters: int = 128,
) -> Dict[str, jax.Array]:
    """Cluster object points on device.

    Args:
        pc: (P, 4) padded cloud.
        object_mask: (P,) bool from ``filter_and_segment``.

    Returns (static shapes):
        point_cluster: (P,) int32 — cluster id in [0, max_clusters) or -1
        n_clusters:    scalar int32 — number of valid clusters
        counts:        (max_clusters,) int32 point counts
        centers:       (max_clusters, 3) centroid xyz
        mins/maxs:     (max_clusters, 3) AABB corners
        mean_intensity:(max_clusters,) float32
        cluster_valid: (max_clusters,) bool
    """
    P = pc.shape[0]
    G = int(round(2 * bev_range / eps))          # xy cells
    GZ = int(round((z_max - z_min) / eps))       # z cells
    nvox = G * G * GZ

    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    ix = jnp.clip(((x + bev_range) / eps).astype(jnp.int32), 0, G - 1)
    iy = jnp.clip(((y + bev_range) / eps).astype(jnp.int32), 0, G - 1)
    iz = jnp.clip(((z - z_min) / eps).astype(jnp.int32), 0, GZ - 1)
    vox = (iz * G + iy) * G + ix                  # linear voxel index
    vox_masked = jnp.where(object_mask, vox, nvox)

    ones = jnp.ones((P,), jnp.float32)
    occ_cnt = jax.ops.segment_sum(ones, vox_masked, num_segments=nvox + 1)[:nvox]
    occ_cnt = occ_cnt.reshape(GZ, G, G)
    occupied = occ_cnt > 0

    # 3x3x3 neighborhood point count via three separable box filters.
    def box3(a, axis):
        up = jnp.roll(a, 1, axis=axis)
        dn = jnp.roll(a, -1, axis=axis)
        # zero the wrap-around slices
        idx = jnp.arange(a.shape[axis])
        first = (idx == 0).reshape([-1 if i == axis else 1 for i in range(a.ndim)])
        last = (idx == a.shape[axis] - 1).reshape(
            [-1 if i == axis else 1 for i in range(a.ndim)])
        up = jnp.where(first, 0.0, up)
        dn = jnp.where(last, 0.0, dn)
        return a + up + dn

    nbr_cnt = box3(box3(box3(occ_cnt, 0), 1), 2)
    core = occupied & (nbr_cnt >= min_samples)

    # --- connected components over core voxels ---
    BIG = jnp.int32(nvox)
    lin = jnp.arange(nvox, dtype=jnp.int32).reshape(GZ, G, G)
    labels = jnp.where(core, lin, BIG)

    def jump(lab):
        flat = jnp.concatenate([lab.reshape(-1), jnp.array([BIG], jnp.int32)])
        return jnp.where(core, flat[lab], BIG)

    def cond(state):
        lab, prev, it = state
        return (it < 64) & jnp.any(lab != prev)

    # Min-label propagation over the full 27-neighborhood (26-connectivity,
    # matching the eps-box contact test) + pointer jumping for O(log) sweeps.
    def nbr_min27(lab):
        padded = jnp.pad(lab, 1, constant_values=nvox)
        m = lab
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dz == dy == dx == 0:
                        continue
                    sl = padded[1 + dz: 1 + dz + GZ,
                                1 + dy: 1 + dy + G,
                                1 + dx: 1 + dx + G]
                    m = jnp.minimum(m, sl)
        return jnp.where(core, m, BIG)

    def body(state):
        lab, _, it = state
        new = nbr_min27(lab)
        new = jump(jump(new))
        return new, lab, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (nbr_min27(labels), labels, jnp.int32(0)))

    # Border voxels: one non-propagating 27-neighborhood adoption pass.
    border = occupied & ~core
    padded = jnp.pad(labels, 1, constant_values=nvox)
    bmin = jnp.full_like(labels, BIG)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sl = padded[1 + dz: 1 + dz + GZ,
                            1 + dy: 1 + dy + G,
                            1 + dx: 1 + dx + G]
                bmin = jnp.minimum(bmin, sl)
    labels = jnp.where(border, bmin, labels)

    # --- per-point root labels ---
    flat_labels = jnp.concatenate(
        [labels.reshape(-1), jnp.array([nvox], jnp.int32)])
    point_root = jnp.where(object_mask, flat_labels[vox_masked], nvox)

    # --- compact to cluster ids in [0, max_clusters) ---
    uniq = jnp.unique(point_root, size=max_clusters + 1, fill_value=nvox)
    is_real = uniq < nvox
    # map each point root -> position in uniq
    pos = jnp.searchsorted(uniq, point_root)
    pos = jnp.clip(pos, 0, max_clusters)
    hit = (uniq[pos] == point_root) & (point_root < nvox)
    cid = jnp.where(hit, pos, max_clusters)  # overflow/noise -> dump slot

    counts = jax.ops.segment_sum(
        jnp.ones((P,), jnp.int32), cid, num_segments=max_clusters + 1)[:max_clusters]
    big_enough = counts >= min_cluster_points
    cluster_valid = is_real[:max_clusters] & big_enough

    # zero out points of dropped clusters
    keep_flags = jnp.concatenate([cluster_valid, jnp.array([False])])
    point_cluster = jnp.where(keep_flags[cid], cid, -1).astype(jnp.int32)

    w = (point_cluster >= 0).astype(jnp.float32)
    cid_stats = jnp.where(point_cluster >= 0, point_cluster, max_clusters)

    def seg_sum(v):
        return jax.ops.segment_sum(v, cid_stats, num_segments=max_clusters + 1)[:max_clusters]

    cnt_f = jnp.maximum(seg_sum(w), 1.0)
    centers = jnp.stack(
        [seg_sum(pc[:, i] * w) / cnt_f for i in range(3)], axis=-1)
    NEG = -1e9
    POS = 1e9
    mins = jnp.stack([
        jax.ops.segment_min(
            jnp.where(point_cluster >= 0, pc[:, i], POS), cid_stats,
            num_segments=max_clusters + 1)[:max_clusters]
        for i in range(3)], axis=-1)
    maxs = jnp.stack([
        jax.ops.segment_max(
            jnp.where(point_cluster >= 0, pc[:, i], NEG), cid_stats,
            num_segments=max_clusters + 1)[:max_clusters]
        for i in range(3)], axis=-1)
    mean_intensity = seg_sum(pc[:, 3] * w) / cnt_f

    counts = jnp.where(cluster_valid, counts, 0)
    return {
        "point_cluster": point_cluster,
        "n_clusters": cluster_valid.sum(dtype=jnp.int32),
        "counts": counts,
        "centers": jnp.where(cluster_valid[:, None], centers, 0.0),
        "mins": jnp.where(cluster_valid[:, None], mins, 0.0),
        "maxs": jnp.where(cluster_valid[:, None], maxs, 0.0),
        "mean_intensity": jnp.where(cluster_valid, mean_intensity, 0.0),
        "cluster_valid": cluster_valid,
    }
