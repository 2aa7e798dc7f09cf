"""Host-side transport of machine-readable marker lines between layers.

The pipeline's structured object knowledge travels in observation TEXT as
line-anchored ``OBJECTS_JSON:`` / ``DETECTIONS_JSON:`` / ``CAMERAS_JSON:``
markers (reference semantics: information between layers is text,
`src/pipeline.py:106-186`).  The reference relies on GPT-4o faithfully
copying those lines through the seed-merge and editor calls
(`src/agents/seed_generation/seedfeature_agent.py:132`,
`src/agents/refinement/editor_agent.py:64-65`); a small on-TPU VLM
cannot be trusted to reproduce hundreds of JSON tokens verbatim — and the
constrained editor structurally cannot (its DFA string alphabet excludes
double quotes).

``carry_markers`` makes the PIPELINE the copier, the same design already
used inside Layer 1 (the lidar/scene-graph agents append their markers
after the model call — `agents/lidar.py`, `agents/scenegraph.py:287`):
model prose flows through the text channel, and the host glue re-appends
the authoritative marker lines from the stage's inputs.  Model-emitted
marker lines are dropped (a generative model can only corrupt them, and a
budget-clipped decode can leave a truncated marker that would poison
downstream JSON parsing).  Information topology is unchanged — markers
still ride the observation text into every downstream prompt.
"""

from __future__ import annotations

from typing import Iterable, List


COUNTS_MARKER = "COUNTS:"


def marker_prefixes() -> tuple:
    from msc_tpu.serving.analytic import CAM_MARKER, DET_MARKER, OBJ_MARKER

    return (OBJ_MARKER, DET_MARKER, CAM_MARKER)


def append_counts(text: str) -> str:
    """Append a ``COUNTS_JSON`` tally of the marker objects to ``text``.

    Counting is deterministic aggregation over data already in the text
    channel, so it belongs to the host data plane — the reference leans
    on GPT-4o to do this arithmetic inside the MQA call
    (`src/agents/structure_caption/caption_agent.py:127-148`); here the
    caption carries the exact tally and the model answers by lookup
    (measured: a 35M VLM sums marker entries at ~50% accuracy but reads
    fields reliably).  Categories/views are normalized with the SAME
    functions the evaluator and analytic answerer use (eval/synonyms.py),
    and the tally is emitted as NATURAL-LANGUAGE lines whose surface form
    matches the "<cnt>N</cnt> <obj>category</obj>" answer template —
    a nested-JSON payload measured WORSE than no tally (count_camera
    57.9% -> 40.0%) because the small model fumbles nested key lookup."""
    from msc_tpu.eval.synonyms import normalize_camera, normalize_object_name
    from msc_tpu.serving.analytic import extract_markers

    objs = extract_markers(text)
    if not objs:
        return text
    scene: dict = {}
    views: dict = {}
    for o in objs:
        cat = (normalize_object_name(o.get("category", ""))
               or str(o.get("category", "")))
        scene[cat] = scene.get(cat, 0) + 1
        view = normalize_camera(str(o.get("direction", "")))
        if view:
            views.setdefault(view, {})
            views[view][cat] = views[view].get(cat, 0) + 1

    def fmt(counts: dict) -> str:
        return "; ".join(f"{n} {c}" for c, n in sorted(counts.items()))

    # zero-fill the scene line over the full question taxonomy: "how
    # many X" questions about ABSENT classes are a large share of the
    # eval (count_scene measured 43% when absence had to be inferred
    # from a class not being listed)
    from msc_tpu.data.mqa import CATEGORY_TO_MQA_OBJECT

    for name in CATEGORY_TO_MQA_OBJECT.values():
        key = normalize_object_name(name) or name
        scene.setdefault(key, 0)

    lines = [f"{COUNTS_MARKER} scene: {fmt(scene)}"]
    for v, c in sorted(views.items()):
        lines.append(f"{COUNTS_MARKER} {v}: {fmt(c)}")
    kept = [l for l in text.splitlines()
            if not l.strip().startswith(COUNTS_MARKER)]
    return "\n".join(kept).rstrip() + "\n" + "\n".join(lines)


def extract_marker_lines(text: str) -> List[str]:
    """All line-anchored marker lines in ``text``, stripped, in order."""
    prefixes = marker_prefixes()
    out = []
    for line in text.splitlines():
        ls = line.strip()
        if ls.startswith(prefixes) and ls not in out:
            out.append(ls)
    return out


def strip_marker_lines(text: str) -> str:
    """``text`` with the raw ``*_JSON`` marker lines removed (COUNTS
    tally lines are kept — they are the human/model-readable digest).

    Used by the MQA prompt: the raw record lists invite the model to
    COUNT entries, a skill it performs at ~50-60% at scene scale (round-3
    held-out measurement), while the host-computed fact line and COUNTS
    tally already carry every number a question needs.  Removing the
    records makes deterministic retrieval the only available strategy."""
    prefixes = marker_prefixes()
    return "\n".join(l for l in text.splitlines()
                     if not l.strip().startswith(prefixes))


def carry_markers(text: str, sources: Iterable[str]) -> str:
    """Return ``text`` with the marker lines of ``sources`` re-appended.

    Marker lines already present in ``text`` (including truncated ones)
    are removed first — the source markers are authoritative.  If the
    sources carry no markers, ``text`` is returned unchanged.
    """
    src_markers: List[str] = []
    for s in sources:
        for m in extract_marker_lines(s or ""):
            if m not in src_markers:
                src_markers.append(m)
    if not src_markers:
        return text
    prefixes = marker_prefixes()
    kept = [l for l in text.splitlines()
            if not l.strip().startswith(prefixes)]
    body = "\n".join(kept).rstrip()
    return body + "\n" + "\n".join(src_markers)
