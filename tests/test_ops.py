"""Kernel golden tests: filter/ground, BEV raster, clustering, box geometry,
splatting, image preprocess — all vs NumPy ports of the reference math."""

import numpy as np
import jax.numpy as jnp
import pytest

from msc_tpu.ops import (
    filter_and_segment,
    pad_point_cloud,
    rasterize_bev,
    voxel_cluster,
    quat_to_rotmat,
    box_corners,
    direction_4way,
    direction_8way,
    render_cluster_views,
    preprocess_images,
)
from msc_tpu.ops.pointcloud import filter_and_segment_reference
from msc_tpu.ops.bev import rasterize_bev_reference
from msc_tpu.ops.boxgeom import DIR4, DIR8
from msc_tpu.ops.splat import gather_cluster_points


@pytest.fixture(scope="module")
def cloud(mock_sample):
    pc, n = pad_point_cloud(mock_sample["point_cloud"], 40960)
    return pc, n, mock_sample["point_cloud"]


def test_filter_and_segment_golden(cloud):
    pc, n, raw = cloud
    masks = filter_and_segment(jnp.asarray(pc), n)
    g_ref, o_ref = filter_and_segment_reference(raw)
    assert int(masks["n_ground"]) == len(g_ref)
    assert int(masks["n_object"]) == len(o_ref)
    # Masked points must be exactly the reference's filtered sets.
    got_g = pc[np.asarray(masks["ground"])]
    got_o = pc[np.asarray(masks["object"])]
    # order-insensitive comparison via lexsort
    def canon(a):
        return a[np.lexsort(a.T)]
    np.testing.assert_allclose(canon(got_g), canon(g_ref), rtol=1e-6)
    np.testing.assert_allclose(canon(got_o), canon(o_ref), rtol=1e-6)


def test_bev_golden_small(cloud):
    pc, n, raw = cloud
    masks = filter_and_segment(jnp.asarray(pc), n)
    res = 200  # small grid keeps the pure-python golden model fast
    out = rasterize_bev(jnp.asarray(pc), masks["ground"], masks["object"], res=res)
    g_ref, o_ref = filter_and_segment_reference(raw)
    d_ref, h_ref, s_ref = rasterize_bev_reference(g_ref, o_ref, res=res)
    np.testing.assert_array_equal(np.asarray(out["density"]), d_ref)
    np.testing.assert_allclose(np.asarray(out["height"]), h_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["semantic"]), s_ref)


def test_bev_empty():
    pc = np.zeros((128, 4), np.float32)
    z = jnp.zeros(128, bool)
    out = rasterize_bev(jnp.asarray(pc), z, z, res=64)
    assert np.asarray(out["density"]).sum() == 0
    assert np.asarray(out["semantic"]).sum() == 0


def test_voxel_cluster_separated_blobs():
    rng = np.random.default_rng(3)
    blobs = [
        rng.normal([5, 0, 0], 0.12, size=(80, 3)),
        rng.normal([-8, 4, 0], 0.12, size=(60, 3)),
        rng.normal([0, 12, 0.5], 0.12, size=(100, 3)),
    ]
    pts = np.vstack(blobs)
    pc = np.zeros((1024, 4), np.float32)
    pc[: len(pts), :3] = pts
    pc[: len(pts), 3] = 0.5
    mask = np.zeros(1024, bool)
    mask[: len(pts)] = True
    out = voxel_cluster(jnp.asarray(pc), jnp.asarray(mask))
    assert int(out["n_clusters"]) == 3
    labels = np.asarray(out["point_cluster"])[: len(pts)]
    # Each blob maps to exactly one cluster id; blobs differ.
    ids = [set(labels[:80]), set(labels[80:140]), set(labels[140:])]
    assert all(len(s) == 1 for s in ids)
    assert len({s.pop() for s in ids}) == 3
    counts = np.asarray(out["counts"])
    assert sorted(counts[counts > 0].tolist()) == [60, 80, 100]
    # centroids near blob centers
    centers = np.asarray(out["centers"])
    valid = np.asarray(out["cluster_valid"])
    got = np.array(sorted(map(tuple, centers[valid].tolist())))
    want = np.array(sorted([(5.0, 0.0, 0.0), (-8.0, 4.0, 0.0), (0.0, 12.0, 0.5)]))
    np.testing.assert_allclose(got, want, atol=0.1)


def test_voxel_cluster_vs_host_dbscan(cloud):
    """On the structured mock scene the voxel CC must broadly agree with
    exact DBSCAN (same eps/min_samples) on cluster count."""
    from msc_tpu.data.lidar_io import dbscan_host

    pc, n, raw = cloud
    masks = filter_and_segment(jnp.asarray(pc), n)
    out = voxel_cluster(jnp.asarray(pc), masks["object"])
    obj = pc[np.asarray(masks["object"])]
    labels, k_exact = dbscan_host(obj, eps=0.5, min_samples=10)
    sizes = np.bincount(labels[labels >= 0]) if k_exact else np.array([])
    k_exact_big = int((sizes >= 5).sum())
    k_voxel = int(out["n_clusters"])
    assert k_exact_big > 0
    assert abs(k_voxel - k_exact_big) <= max(2, k_exact_big // 3)


def test_voxel_cluster_density_gate():
    """Sparse scatter below min_samples density must yield no clusters."""
    rng = np.random.default_rng(4)
    pc = np.zeros((512, 4), np.float32)
    pc[:100, :3] = rng.uniform(-40, 40, size=(100, 3)) * np.array([1, 1, 0.05])
    mask = np.zeros(512, bool)
    mask[:100] = True
    out = voxel_cluster(jnp.asarray(pc), jnp.asarray(mask), min_samples=10)
    assert int(out["n_clusters"]) == 0
    assert (np.asarray(out["point_cluster"]) == -1).all()


def test_quat_to_rotmat_identity_and_yaw():
    q = jnp.array([[1.0, 0, 0, 0], [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
    R = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    # 90-degree yaw: x -> y
    np.testing.assert_allclose(R[1] @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)


def test_box_corners_axis_aligned():
    t = jnp.array([[10.0, 0.0, 1.0]])
    s = jnp.array([[2.0, 4.0, 1.5]])  # w, l, h
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    c = np.asarray(box_corners(t, s, q))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:, 0].min(), 8.0, atol=1e-5)   # l/2 along x
    np.testing.assert_allclose(c[:, 0].max(), 12.0, atol=1e-5)
    np.testing.assert_allclose(c[:, 1].min(), -1.0, atol=1e-5)  # w/2 along y
    np.testing.assert_allclose(c[:, 2].max(), 1.75, atol=1e-5)


def _dir4_reference(x, y):
    # scenegraph_agent.py:190-201
    ang = (np.degrees(np.arctan2(y, x)) + 360) % 360
    if 45 <= ang < 135:
        return "front"
    if 135 <= ang < 225:
        return "left"
    if 225 <= ang < 315:
        return "back"
    return "right"


def _dir8_reference(x, y):
    # lidar_agent.py:506-530
    ang = (np.degrees(np.arctan2(y, x)) + 360) % 360
    if ang >= 337.5 or ang < 22.5:
        return "front_right"
    if ang < 67.5:
        return "front"
    if ang < 112.5:
        return "front_left"
    if ang < 157.5:
        return "left"
    if ang < 202.5:
        return "back_left"
    if ang < 247.5:
        return "back"
    if ang < 292.5:
        return "back_right"
    return "right"


def test_directions_golden():
    rng = np.random.default_rng(5)
    xy = rng.uniform(-50, 50, size=(500, 2)).astype(np.float32)
    d4 = np.asarray(direction_4way(jnp.asarray(xy)))
    d8 = np.asarray(direction_8way(jnp.asarray(xy)))
    for i, (x, y) in enumerate(xy):
        assert DIR4[d4[i]] == _dir4_reference(x, y), (x, y)
        assert DIR8[d8[i]] == _dir8_reference(x, y), (x, y)


def test_render_cluster_views():
    rng = np.random.default_rng(6)
    pts = rng.normal(0, 0.5, size=(2, 300, 3))
    pc = np.zeros((2, 512, 4), np.float32)
    pc[:, :300, :3] = pts
    pc[:, :300, 3] = rng.uniform(0, 1, size=(2, 300))
    mask = np.zeros((2, 512), bool)
    mask[:, :300] = True
    imgs = np.asarray(render_cluster_views(jnp.asarray(pc), jnp.asarray(mask),
                                           img_size=128))
    assert imgs.shape == (2, 256, 256)
    assert imgs.dtype == np.uint8
    # every quadrant must contain drawn (non-background) pixels
    for q in (imgs[0][:128, :128], imgs[0][:128, 128:],
              imgs[0][128:, :128], imgs[0][128:, 128:]):
        assert (q < 255).sum() > 50


def test_preprocess_images(mock_sample):
    batch = np.stack(mock_sample["images"][:2])
    out = np.asarray(preprocess_images(jnp.asarray(batch), size=224))
    assert out.shape == (2, 224, 224, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_merge_fragment_clusters():
    from msc_tpu.ops.clustering import merge_fragment_clusters

    rng = np.random.default_rng(0)
    # a far "bus" split into three face fragments 1 m apart at r~30 m
    frags = []
    for k, x0 in enumerate((26.0, 30.0, 34.0)):
        pts = rng.uniform(0, 1, size=(30, 3)) * [3.0, 0.3, 2.8]
        pts += [x0, 4.0, -1.3]
        frags.append(pts)
    # a genuinely separate near pair (r < min_merge_range): must NOT merge
    near_a = rng.uniform(0, 1, size=(20, 3)) * [1.0, 1.0, 1.0] + [5.0, 0.0, -1.3]
    near_b = near_a + [1.8, 0.0, 0.0]
    pc = np.vstack(frags + [near_a, near_b])
    pc = np.hstack([pc, np.zeros((len(pc), 1))]).astype(np.float32)
    lab = np.concatenate([np.full(30, 0), np.full(30, 1), np.full(30, 2),
                          np.full(20, 3), np.full(20, 4)]).astype(np.int32)
    out, k = merge_fragment_clusters(pc, lab, 5, eps=0.5)
    assert k == 3  # three far fragments -> 1; near pair stays 2
    far_ids = set(out[:90].tolist())
    assert len(far_ids) == 1
    assert out[90:110].max() != out[110:].max()
    # merged box exceeding a single object's footprint is refused
    wide_a = rng.uniform(0, 1, size=(25, 3)) * [2.0, 3.0, 2.0] + [28.0, -8.0, -1.3]
    wide_b = wide_a + [2.8, 0.0, 0.0]   # union ~4.8 x 3 -> fits; then widen
    wide_b[:, 1] += 1.2                 # union w > 3.4 -> refuse
    pc2 = np.hstack([np.vstack([wide_a, wide_b]),
                     np.zeros((50, 1))]).astype(np.float32)
    lab2 = np.concatenate([np.full(25, 0), np.full(25, 1)]).astype(np.int32)
    _, k2 = merge_fragment_clusters(pc2, lab2, 2, eps=0.5)
    assert k2 == 2


def test_split_oversize_clusters():
    from msc_tpu.ops.clustering import split_oversize_clusters

    rng = np.random.default_rng(1)
    # truck+car contact blob: 12.5 m long, 5 m wide -> must split in two
    a = rng.uniform(0, 1, size=(200, 3)) * [7.0, 2.5, 2.6] + [10.0, 0.0, -1.4]
    b = rng.uniform(0, 1, size=(120, 3)) * [4.5, 2.0, 1.2] + [17.5, 2.6, -1.4]
    pc = np.hstack([np.vstack([a, b]), np.zeros((320, 1))]).astype(np.float32)
    lab = np.zeros(320, np.int32)
    out, k = split_oversize_clusters(pc, lab, 1)
    assert k == 2
    # the two halves land on the two true objects (majority per object)
    assert np.bincount(out[:200]).argmax() != np.bincount(out[200:]).argmax()
    # a plausible single object is left alone
    only = np.hstack([a, np.zeros((200, 1))]).astype(np.float32)
    out1, k1 = split_oversize_clusters(only, np.zeros(200, np.int32), 1)
    assert k1 == 1


def test_classify_cluster_geometry_families():
    from msc_tpu.serving.analytic import classify_cluster_geometry

    # measured dims carry the ground-cut (~0.4 m off physical height)
    cases = {
        (2.5, 0.5, 0.6): "barrier",       # was "bicycle" before round 4
        (1.8, 0.6, 0.8): "bicycle",
        (2.1, 0.8, 1.0): "motorcycle",
        (0.6, 0.6, 1.35): "pedestrian",
        (0.4, 0.4, 0.4): "traffic_cone",
        (4.5, 2.0, 1.2): "car",
        (7.0, 2.5, 2.6): "truck",
        (11.0, 2.9, 3.0): "bus",
    }
    for dims, want in cases.items():
        got = classify_cluster_geometry(dims, 100)["category"]
        assert got == want, f"{dims}: {got} != {want}"
