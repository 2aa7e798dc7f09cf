"""End-to-end single-scene smoke test.

Parity with `src/mock_test.py` (the reference's canonical manual test,
SURVEY.md section 4), hermetic by default: mock loader + analytic backend,
no credentials, no dataset, no network.  Reference bugs NOT reproduced:
`mock_test.py:46` reads a nonexistent ``result['final_caption']`` key
(KeyError) and `mock_test.py:13` mislabels the camera order.

Usage:
    python -m msc_tpu.tools.mock_test [--backend analytic|fake|vlm]
                                      [--modality full|cams|lidar]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    choices=["analytic", "fake", "vlm"])
    ap.add_argument("--modality", default="cams",
                    choices=["full", "cams", "lidar"])
    ap.add_argument("--scene", type=int, default=0)
    args = ap.parse_args()

    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from msc_tpu.config import Config, ModalityConfig
    from msc_tpu.data.nuscenes import create_loader
    from msc_tpu.pipeline import SemanticCaptioningPipeline

    cfg = Config.from_env()
    if args.backend:
        cfg.model.backend.kind = args.backend

    modality = {
        # camera-only default mirrors the reference's MODALITY_CONFIG
        # (`mock_test.py:9-14`)
        "cams": ModalityConfig(use_cameras=True, use_lidar=False,
                               use_annotations=False,
                               camera_indices=[0, 1, 2, 3, 4, 5]),
        "lidar": ModalityConfig(use_cameras=False, use_lidar=True,
                                use_annotations=False),
        "full": ModalityConfig(),
    }[args.modality]

    pipeline = SemanticCaptioningPipeline(cfg.model, cfg.lidar)
    loader = create_loader(cfg.data.dataroot, cfg.data.version,
                           use_mock=cfg.data.use_mock)
    sample = loader.get_sample_by_scene_index(args.scene, 0)

    result = pipeline.process_scene(
        images=sample["images"],
        camera_names=sample["camera_names"],
        point_cloud=sample["point_cloud"],
        annotations=sample["annotations"],
        modality_config=modality,
    )

    print("\n" + "=" * 80)
    print(json.dumps(result["structured_caption"], indent=2))

    print("\n" + "=" * 80)
    question = ("How many <obj>cars</obj> are visible in the <cam>front</cam> "
                "of the ego car?")
    answer = pipeline.answer_mqa(question, result)
    print(f"Question: {question}")
    print(f"Answer: {answer}")

    print("\n" + pipeline.timer.report())


if __name__ == "__main__":
    main()
