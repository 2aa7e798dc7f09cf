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


# ---------------------------------------------------------------------------
# Host post-pass: re-join range-fragmented clusters.
# ---------------------------------------------------------------------------

def merge_fragment_clusters(pc_np, point_cluster, n_clusters,
                            eps: float = 0.5, r0: float = 10.0,
                            min_merge_range: float = 15.0,
                            max_extent=(12.0, 3.4, 4.2)):
    """Merge cluster fragments of sparse, far objects (host; K is tiny).

    A fixed clustering eps (0.5 m, reference `src/agents/content_transform/
    lidar_agent.py:134-150`) under-connects at range: LiDAR return density
    falls ~1/r^2, so a bus at 30 m splits into face fragments that then
    classify as bicycles/pedestrians (measured round 4: bus detection 50%,
    9 ghost two-wheelers over 12 held-out scenes).  The physically right
    cure is a range-adaptive connection radius; doing that inside the
    device voxel pass would need a data-dependent grid, so instead the
    device output gets this O(K^2) host post-pass over cluster AABBs:

    merge clusters i, j when
      * both are beyond ``min_merge_range`` (near clusters never fragment
        at eps = 0.5, and keeping the gate high avoids gluing genuinely
        adjacent near objects), and
      * the 3D gap between their AABBs is <= eps * clip(r / r0, 1, 4)
        (the adaptive radius, r = nearer cluster's range), and
      * the merged AABB still fits a plausible single object
        (``max_extent``: sorted-xy l, w and height of a bus + slack) —
        this is what stops a parked row from chaining into one blob.

    Runs to a fixpoint so A-B-C fragment chains join transitively.
    Returns (point_cluster, n_clusters) with compact relabeled ids.
    """
    import numpy as np

    K = int(n_clusters)
    if K <= 1:
        return point_cluster, K
    pts = pc_np[:, :3]
    mins = np.full((K, 3), np.inf)
    maxs = np.full((K, 3), -np.inf)
    lab = point_cluster
    sel = lab >= 0
    np.minimum.at(mins, lab[sel], pts[sel])
    np.maximum.at(maxs, lab[sel], pts[sel])

    parent = np.arange(K)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    changed = True
    while changed:
        changed = False
        roots = sorted({find(i) for i in range(K)})
        for a_i in range(len(roots)):
            for b_i in range(a_i + 1, len(roots)):
                a, b = find(roots[a_i]), find(roots[b_i])
                if a == b:
                    continue
                ca = (mins[a] + maxs[a]) / 2
                cb = (mins[b] + maxs[b]) / 2
                r = min(float(np.hypot(ca[0], ca[1])),
                        float(np.hypot(cb[0], cb[1])))
                if r < min_merge_range:
                    continue
                gap = np.maximum(0.0, np.maximum(mins[a] - maxs[b],
                                                 mins[b] - maxs[a]))
                if float(np.linalg.norm(gap)) > eps * np.clip(r / r0, 1.0, 4.0):
                    continue
                m_lo = np.minimum(mins[a], mins[b])
                m_hi = np.maximum(maxs[a], maxs[b])
                ext = m_hi - m_lo
                w_l = sorted(ext[:2])
                if (w_l[1] > max_extent[0] or w_l[0] > max_extent[1]
                        or ext[2] > max_extent[2]):
                    continue
                parent[b] = a
                mins[a], maxs[a] = m_lo, m_hi
                changed = True

    roots = np.array([find(i) for i in range(K)])
    uniq, compact = np.unique(roots, return_inverse=True)
    if len(uniq) == K:
        return point_cluster, K
    out = np.where(sel, compact[np.clip(lab, 0, K - 1)], -1).astype(lab.dtype)
    return out, int(len(uniq))


def split_oversize_clusters(pc_np, point_cluster, n_clusters,
                            max_width: float = 3.05,
                            max_length: float = 12.2,
                            max_rounds: int = 3):
    """Split clusters whose AABB exceeds any single object's footprint.

    Mock/real scenes can place two objects in contact; eps-clustering then
    returns one blob (e.g. truck+car measuring 12.3 x 5.1 m) that no
    single-class rule fits.  No real traffic object is wider than a bus
    (~2.9 m) or longer than ~12 m, so a cluster beyond ``max_width`` on
    its SHORT sorted-xy axis (or ``max_length`` on the long one) must be
    a contact blob: 2-means on xy splits it, repeated up to
    ``max_rounds`` for triple blobs.  Complementary to
    ``merge_fragment_clusters`` (which joins same-object fragments; this
    splits different-object contacts — the two never fight because merge
    rejects any union exceeding these same bounds).
    Returns (point_cluster, n_clusters), compact ids.
    """
    import numpy as np

    lab = point_cluster.copy()
    K = int(n_clusters)
    for _ in range(max_rounds):
        did = False
        for c in range(K):
            idx = np.flatnonzero(lab == c)
            if len(idx) < 8:
                continue
            xy = pc_np[idx, :2]
            ext = np.sort(xy.max(0) - xy.min(0))
            if ext[0] <= max_width and ext[1] <= max_length:
                continue
            # project onto the xy principal axis (handles diagonal
            # unions that an axis-aligned cut would shred), then cut at
            # the DENSITY VALLEY: two objects in contact each stay
            # dense, so the projected histogram dips at the contact —
            # unlike Otsu/k-means, a valley cut never shreds the
            # smaller object when masses are unequal
            centered = xy - xy.mean(0)
            cov = centered.T @ centered / max(1, len(xy) - 1)
            evals, evecs = np.linalg.eigh(cov)
            proj = centered @ evecs[:, int(np.argmax(evals))]
            span = float(proj.max() - proj.min())
            nbins = max(8, int(span / 0.4))
            hist, edges = np.histogram(proj, bins=nbins)
            sm = np.convolve(hist, [1, 2, 1], mode="same")
            # interior search only: the cut must leave >=1 m per side
            margin = max(1, int(round(1.0 / (span / nbins))))
            if nbins - 2 * margin < 1:
                continue
            vi = int(np.argmin(sm[margin:nbins - margin])) + margin
            thresh = (edges[vi] + edges[vi + 1]) / 2
            assign = (proj > thresh).astype(np.int32)
            if assign.sum() < 4 or (1 - assign).sum() < 4:
                continue  # degenerate sliver: refuse the split
            lab[idx[assign == 1]] = K
            K += 1
            did = True
        if not did:
            break
    return lab, K
