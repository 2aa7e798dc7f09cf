"""Static docs/showcase generator.

Parity with the reference's docs page (`docs/index.html` + `docs/assets/`,
SURVEY.md component #21): a qualitative, per-scene showcase of every layer's
outputs, generated from the detailed logs — no accuracy claims, just the
pipeline's artifacts.

Usage: python -m msc_tpu.tools.build_docs [N] [docs_dir]
"""

from __future__ import annotations

import base64
import html
import os
import sys


def _img_tag(path: str, width: int = 320) -> str:
    with open(path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    ext = os.path.splitext(path)[1].lstrip(".")
    return (f'<img src="data:image/{ext};base64,{b64}" width="{width}" '
            f'style="margin:4px;border:1px solid #ccc"/>')


def build_docs(num_scenes: int = 2, docs_dir: str = "docs"):
    import tempfile

    from msc_tpu.tools.detailed_logs import generate_detailed_logs

    work = tempfile.mkdtemp(prefix="msc_docs_")
    generate_detailed_logs(num_scenes, work)

    sections = []
    for i in range(1, num_scenes + 1):
        log = next((f for f in os.listdir(work)
                    if f.startswith(f"scene_{i}_") and f.endswith(".log")),
                   None)
        if log is None:
            continue
        assets = os.path.join(work, log[:-4] + "_assets")
        with open(os.path.join(work, log)) as f:
            transcript = f.read()

        imgs = []
        for name in ("bev_semantic.png", "bev_density.png", "bev_height.png",
                     "CAM_FRONT.jpg", "CAM_BACK.jpg"):
            p = os.path.join(assets, name)
            if os.path.exists(p):
                imgs.append(_img_tag(p))
        sections.append(f"""
<section>
  <h2>Scene {i} — {html.escape(log)}</h2>
  <div>{''.join(imgs)}</div>
  <details><summary>Full per-layer transcript</summary>
  <pre>{html.escape(transcript)}</pre></details>
</section>""")

    os.makedirs(docs_dir, exist_ok=True)
    page = f"""<!doctype html>
<html><head><meta charset="utf-8">
<title>msc_tpu — multimodal scene captioning showcase</title>
<style>
 body {{ font-family: system-ui, sans-serif; max-width: 1100px;
        margin: 2rem auto; padding: 0 1rem; }}
 pre {{ background: #f6f6f6; padding: 1rem; overflow-x: auto;
       white-space: pre-wrap; font-size: 12px; }}
 h1 {{ border-bottom: 2px solid #333; }}
</style></head><body>
<h1>msc_tpu — TPU-native multimodal scene captioning</h1>
<p>Qualitative showcase: each scene runs the full 4-layer pipeline
(content transformation over 6 cameras + LiDAR + annotations &rarr; seed
captions &rarr; iterative refinement &rarr; structured JSON caption).
BEV rasterization, point clustering and cluster rendering execute as
fused device kernels; agent responses come from the configured backend.</p>
{''.join(sections)}
</body></html>"""
    out = os.path.join(docs_dir, "index.html")
    with open(out, "w") as f:
        f.write(page)
    print(f"docs -> {out}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    docs = sys.argv[2] if len(sys.argv) > 2 else "docs"
    build_docs(n, docs)


if __name__ == "__main__":
    main()
