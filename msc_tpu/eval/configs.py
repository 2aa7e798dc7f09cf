"""Modality-ablation configuration generator.

Parity with `src/evaluation_framework.py:379-455`: the ACTIVE set is the
reference's five configs (all_cams, lidar_only, cams_lidar,
cams_annotations, full); the commented-out variants of the reference
(per-camera, front_cams, annotations_only, lidar_annotations) are
available behind ``include_extended=True`` instead of dead code.
"""

from __future__ import annotations

from typing import Dict

from msc_tpu.config import ModalityConfig


class ModalityConfigGenerator:
    """Enumerates modality-ablation configurations."""

    @staticmethod
    def generate_all_configs(include_extended: bool = False
                             ) -> Dict[str, ModalityConfig]:
        configs: Dict[str, ModalityConfig] = {
            "all_cams": ModalityConfig(use_cameras=True, camera_indices=None,
                                       use_lidar=False, use_annotations=False),
            "lidar_only": ModalityConfig(use_cameras=False, use_lidar=True,
                                         use_annotations=False),
            "cams_lidar": ModalityConfig(use_cameras=True, use_lidar=True,
                                         use_annotations=False),
            "cams_annotations": ModalityConfig(use_cameras=True,
                                               use_lidar=False,
                                               use_annotations=True),
            "full": ModalityConfig(use_cameras=True, use_lidar=True,
                                   use_annotations=True),
        }
        if include_extended:
            configs["front_cams"] = ModalityConfig(
                use_cameras=True, camera_indices=[0, 1, 2],
                use_lidar=False, use_annotations=False)
            configs["annotations_only"] = ModalityConfig(
                use_cameras=False, use_lidar=False, use_annotations=True)
            configs["lidar_annotations"] = ModalityConfig(
                use_cameras=False, use_lidar=True, use_annotations=True)
            for i in range(6):
                configs[f"cam_{i}_only"] = ModalityConfig(
                    use_cameras=True, camera_indices=[i],
                    use_lidar=False, use_annotations=False)
        return configs
