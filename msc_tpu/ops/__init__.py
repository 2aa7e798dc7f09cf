from msc_tpu.ops.pointcloud import filter_and_segment, pad_point_cloud
from msc_tpu.ops.bev import rasterize_bev, decorate_semantic_bev
from msc_tpu.ops.clustering import voxel_cluster
from msc_tpu.ops.boxgeom import (
    quat_to_rotmat,
    box_corners,
    direction_4way,
    direction_8way,
)
from msc_tpu.ops.splat import render_cluster_views
from msc_tpu.ops.image import preprocess_images

__all__ = [
    "filter_and_segment",
    "pad_point_cloud",
    "rasterize_bev",
    "decorate_semantic_bev",
    "voxel_cluster",
    "quat_to_rotmat",
    "box_corners",
    "direction_4way",
    "direction_8way",
    "render_cluster_views",
    "preprocess_images",
]
