"""Detailed per-scene log generator (demo/doc artifacts).

Parity with `src/generate_detailed_logs.py:24-375`: for the first sample
of the first N scenes, run the FULL-modality pipeline and write a
per-scene ``.log`` transcript of every agent's output by layer, an assets
directory (camera JPEGs, annotations.csv, 3 BEV PNGs) and a SUMMARY.txt.

Usage: python -m msc_tpu.tools.detailed_logs [N] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime


def _w(f, title: str, body: str):
    f.write(f"\n{'=' * 80}\n{title}\n{'=' * 80}\n{body}\n")


def generate_detailed_logs(num_scenes: int = 3, out_dir: str = "detailed_logs"):
    from msc_tpu.config import Config, ModalityConfig
    from msc_tpu.data.nuscenes import create_loader
    from msc_tpu.pipeline import SemanticCaptioningPipeline
    from msc_tpu.tools.export_sample import export_sample_data
    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.from_env()
    loader = create_loader(cfg.data.dataroot, cfg.data.version,
                           use_mock=cfg.data.use_mock)
    pipeline = SemanticCaptioningPipeline(cfg.model, cfg.lidar, verbose=False)
    os.makedirs(out_dir, exist_ok=True)

    summaries = []
    scenes = loader.get_scene_list()[:num_scenes]
    for i, scene in enumerate(scenes, 1):
        sample = loader.load_scene_samples(scene["token"], max_samples=1)[0]
        token8 = sample["sample_token"][:8]
        assets = os.path.join(out_dir, f"scene_{i}_{token8}_assets")
        export_sample_data(sample, assets)

        result = pipeline.process_scene(
            images=sample["images"],
            camera_names=sample["camera_names"],
            point_cloud=sample["point_cloud"],
            annotations=sample["annotations"],
            modality_config=ModalityConfig(),
        )

        log_path = os.path.join(out_dir, f"scene_{i}_{token8}.log")
        with open(log_path, "w") as f:
            f.write(f"Scene {i}: {sample['scene_name']} "
                    f"({sample['sample_token']})\n")
            f.write(f"Description: {sample['scene_description']}\n")
            f.write(f"Generated: {datetime.now().isoformat()}\n")
            f.write(f"Location: {sample['metadata']['location']}, "
                    f"{sample['metadata']['nbr_objects']} objects, "
                    f"{len(sample['point_cloud'])} lidar points\n")

            stages = result["pipeline_stages"]
            for out in stages["layer1_content_transformation"]:
                obs = out.get("observations", "")
                if isinstance(obs, dict):
                    obs = "\n\n".join(f"[{k}]\n{v}" for k, v in obs.items())
                _w(f, f"LAYER 1 — {out['agent']}", obs)
                if out.get("structured_report"):
                    _w(f, f"LAYER 1 — {out['agent']} structured report",
                       out["structured_report"])
            seed = stages["layer2_seed_caption"]
            for fc in seed["focused_captions"]:
                _w(f, f"LAYER 2 — focused caption ({fc['focus_area']})",
                   fc["caption"])
            _w(f, "LAYER 2 — merged seed caption", seed["final_caption"])
            ref = stages["layer3_refinement"]
            for it in ref["iterations"]:
                _w(f, f"LAYER 3 — iteration {it['iteration']} "
                      f"(has_suggestions={it['has_suggestions']})",
                   "suggestions:\n" + "\n".join(
                       f"- {s}" for s in it["suggestions"])
                   + f"\nreasoning: {it['reasoning']}"
                   + "\nchanges:\n" + "\n".join(
                       f"- {c}" for c in it["changes_made"]))
            _w(f, "LAYER 3 — final refined caption", ref["final_caption"])
            _w(f, "LAYER 4 — structured caption",
               json.dumps(result["structured_caption"], indent=2))

        summaries.append(
            f"scene {i}: {sample['scene_name']} "
            f"({result['refinement_metadata']['iterations']} refinement "
            f"iterations, converged="
            f"{result['refinement_metadata']['converged']}) -> {log_path}")
        print(summaries[-1])

    with open(os.path.join(out_dir, "SUMMARY.txt"), "w") as f:
        f.write(f"Detailed pipeline logs — {datetime.now().isoformat()}\n")
        f.write(f"Backend: {cfg.model.backend.kind}\n\n")
        f.write("\n".join(summaries) + "\n")
    print(f"summary -> {os.path.join(out_dir, 'SUMMARY.txt')}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = sys.argv[2] if len(sys.argv) > 2 else "detailed_logs"
    generate_detailed_logs(n, out)


if __name__ == "__main__":
    main()
