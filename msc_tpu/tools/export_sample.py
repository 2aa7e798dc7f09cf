"""Sample data exporter.

Parity with `src/export_sample_data.py:17-148`: dump a sample's camera
JPEGs, the 3 BEV PNGs, annotations.csv, and console stats — fully offline
(no model calls; the BEV path is a first-class API here instead of the
reference's throwaway MockClient LiDARAgent trick at
`export_sample_data.py:53-56`).

Usage: python -m msc_tpu.tools.export_sample <sample_token|scene_idx> [out_dir]
"""

from __future__ import annotations

import os
import sys


def export_sample_data(sample: dict, out_dir: str):
    import cv2
    import numpy as np
    import pandas as pd

    from msc_tpu.agents.lidar import LiDARAgent
    from msc_tpu.serving.analytic import AnalyticBackend
    from msc_tpu.serving.client import ChatClient

    os.makedirs(out_dir, exist_ok=True)

    # camera JPEGs
    for img, name in zip(sample["images"], sample["camera_names"]):
        cv2.imwrite(os.path.join(out_dir, f"{name}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 90])

    # BEV PNGs (offline device path)
    agent = LiDARAgent(ChatClient(AnalyticBackend()), "msc-vlm-s", "LiDARAgent")
    bev = agent.generate_bev(sample["point_cloud"])
    cv2.imwrite(os.path.join(out_dir, "bev_semantic.png"), bev["semantic"])
    cv2.imwrite(os.path.join(out_dir, "bev_density.png"), bev["density"])
    hmax = float(np.max(bev["height"])) or 1.0
    cv2.imwrite(os.path.join(out_dir, "bev_height.png"),
                (np.clip(bev["height"] / hmax, 0, 1) * 255).astype(np.uint8))

    # annotations.csv
    rows = []
    for ann in sample["annotations"]:
        rows.append({
            "token": ann["token"],
            "category_name": ann["category_name"],
            "x": ann["translation"][0], "y": ann["translation"][1],
            "z": ann["translation"][2],
            "width": ann["size"][0], "length": ann["size"][1],
            "height": ann["size"][2],
            "visibility": ann["visibility_token"],
            "num_lidar_pts": ann["num_lidar_pts"],
        })
    import pandas as pd  # noqa: F811

    pd.DataFrame(rows).to_csv(os.path.join(out_dir, "annotations.csv"),
                              index=False)

    pc = sample["point_cloud"]
    print(f"sample {sample['sample_token']}: {len(sample['images'])} cameras, "
          f"{len(pc)} lidar points, {len(sample['annotations'])} annotations")
    print(f"exported -> {out_dir}")


def main():
    from msc_tpu.config import Config
    from msc_tpu.data.nuscenes import create_loader
    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.from_env()
    loader = create_loader(cfg.data.dataroot, cfg.data.version,
                           use_mock=cfg.data.use_mock)

    arg = sys.argv[1] if len(sys.argv) > 1 else "0"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "exported_data"
    if arg.isdigit():
        sample = loader.get_sample_by_scene_index(int(arg), 0)
    else:
        sample = loader.load_sample(arg)
    export_sample_data(sample, out_dir)


if __name__ == "__main__":
    main()
