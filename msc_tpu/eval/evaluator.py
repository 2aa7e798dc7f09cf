"""nuScenes-MQA evaluator: tag parsing + metrics.

Semantics parity with `src/evaluation_framework.py:16-376`: regex tag
parsers for questions/answers, ':'-separated ground-truth variants (first
taken), bidirectional-substring object normalization, exact/count/object/
partial metrics over normalized {object -> count} dicts, aggregation
overall / per-question-type / per-tag.

One unification (SURVEY.md section 5): the synonym tables and the scorer
live here alone — `src/graphs.py:113-117` recomputing a *stricter*
whole-dict accuracy is a reference inconsistency not reproduced; the
visualizer consumes this evaluator.
"""

from __future__ import annotations

import dataclasses
import re
from collections import defaultdict
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

from msc_tpu.data.mqa import load_mqa_csv
from msc_tpu.eval.synonyms import normalize_camera, normalize_object_name


def _numbers(text: str) -> List[float]:
    return [float(x) for x in re.findall(r"-?\d+(?:\.\d+)?", text or "")]


def _tag_content_hits(pred: Dict[str, Any], gt: Dict[str, Any]
                      ) -> Dict[str, float]:
    """Content correctness of the non-target tags, for GT answers that
    carry them: <cam> by normalized direction; <dst> numeric within 10%
    or 1.0 m; <loc> both coordinates within 1.0 unit."""
    hits: Dict[str, float] = {}
    if gt.get("camera"):
        hits["cam"] = float(
            pred.get("camera") is not None
            and normalize_camera(pred["camera"]) == normalize_camera(
                gt["camera"]))
    if gt.get("distance"):
        g = _numbers(gt["distance"])
        p = _numbers(pred.get("distance") or "")
        hits["dst"] = float(
            bool(g) and bool(p)
            and abs(p[0] - g[0]) <= max(1.0, 0.1 * abs(g[0])))
    if gt.get("location"):
        g = _numbers(gt["location"])
        p = _numbers(pred.get("location") or "")
        hits["loc"] = float(
            len(g) >= 2 and len(p) >= 2
            and abs(p[0] - g[0]) <= 1.0 and abs(p[1] - g[1]) <= 1.0)
    return hits


@dataclasses.dataclass
class MQAMetrics:
    """Aggregate metrics container (parity `evaluation_framework.py:16-25`)."""

    overall_accuracy: float
    per_question_type: Dict[str, Any]
    count_accuracy: float
    object_accuracy: float
    total_questions: int
    correct_answers: int
    per_tag_accuracy: Dict[str, Any]
    # msc_tpu extension (not in the reference's MQAMetrics): content
    # accuracy of the non-target tags — <cam> (normalized direction),
    # <dst>/<loc> (numeric, 10% / 1.0-unit tolerance) — measured over
    # questions whose GT carries that tag.  The reference parses these
    # tags but never scores their content; without this, loc/cam/dst
    # buckets score trivially (round-1 VERDICT item 7).
    tag_content_accuracy: Dict[str, float] = dataclasses.field(
        default_factory=dict)


class ComprehensiveMQAEvaluator:
    """Tag-based MQA scorer."""

    def __init__(self, mqa_csv_path: Optional[str] = None,
                 mqa_df: Optional[pd.DataFrame] = None):
        if mqa_df is not None:
            self.mqa_data = mqa_df
        elif mqa_csv_path is not None:
            self.mqa_data = load_mqa_csv(mqa_csv_path)
        else:
            raise ValueError("need mqa_csv_path or mqa_df")

    # -- tag parsing -----------------------------------------------------
    @staticmethod
    def parse_tags_from_question(question: str) -> Dict[str, List[str]]:
        """Parity `evaluation_framework.py:62-97`."""
        tags = {}
        for tag in ("obj", "cam", "dst", "loc"):
            found = re.findall(rf"<{tag}>(.*?)</{tag}>", question,
                               re.IGNORECASE)
            tags[tag] = [x.strip() for x in found]
        return tags

    @staticmethod
    def parse_tags_from_answer(answer: str) -> Dict[str, Any]:
        """Parity `evaluation_framework.py:99-162`."""
        parsed = {"objects": [], "binary_answer": None, "camera": None,
                  "distance": None, "location": None}
        if not isinstance(answer, str):
            return parsed
        for target in re.findall(r"<target>(.*?)</target>", answer,
                                 re.DOTALL | re.IGNORECASE):
            obj: Dict[str, Any] = {}
            cnt = re.search(r"<cnt>(\d+)</cnt>", target, re.IGNORECASE)
            if cnt:
                obj["count"] = int(cnt.group(1))
            name = re.search(r"<obj>(.*?)</obj>", target, re.IGNORECASE)
            if name:
                obj["object"] = name.group(1).strip()
            if obj:
                parsed["objects"].append(obj)
        ans = re.search(r"<ans>(.*?)</ans>", answer, re.IGNORECASE)
        if ans:
            parsed["binary_answer"] = ans.group(1).strip().lower()
        for key, tag in (("camera", "cam"), ("distance", "dst"),
                         ("location", "loc")):
            m = re.search(rf"<{tag}>(.*?)</{tag}>", answer, re.IGNORECASE)
            if m:
                parsed[key] = m.group(1).strip()
        return parsed

    def parse_ground_truth_answer(self, answer: str) -> Dict[str, Any]:
        """GT strings carry ':'-separated variants; first taken
        (parity `evaluation_framework.py:164-167`)."""
        return self.parse_tags_from_answer(str(answer).split(":")[0])

    normalize_object_name = staticmethod(normalize_object_name)

    # -- comparison -------------------------------------------------------
    def compare_answers(self, pred_objs: List[Dict],
                        gt_objs: List[Dict]) -> Dict[str, float]:
        """Parity `evaluation_framework.py:187-245`."""
        metrics = {"exact_match": 0.0, "count_match": 0.0,
                   "object_match": 0.0, "partial_credit": 0.0}
        if not pred_objs and not gt_objs:
            metrics.update(exact_match=1.0, count_match=1.0, object_match=1.0)
            return metrics
        if not pred_objs or not gt_objs:
            return metrics

        pred = {normalize_object_name(o.get("object", "")): o.get("count", 0)
                for o in pred_objs}
        gt = {normalize_object_name(o.get("object", "")): o.get("count", 0)
              for o in gt_objs}
        if pred == gt:
            metrics.update(exact_match=1.0, count_match=1.0,
                           object_match=1.0, partial_credit=1.0)
            return metrics

        pset, gset = set(pred), set(gt)
        if pset == gset:
            metrics["object_match"] = 1.0
            hits = sum(1 for o in gset if pred.get(o) == gt.get(o))
            metrics["count_match"] = hits / len(gset)
        else:
            overlap = pset & gset
            if overlap:
                metrics["object_match"] = len(overlap) / len(gset)
                hits = sum(1 for o in overlap if pred.get(o) == gt.get(o))
                metrics["count_match"] = hits / len(gset)
        metrics["partial_credit"] = (metrics["object_match"]
                                     + metrics["count_match"]) / 2
        return metrics

    # -- aggregation ------------------------------------------------------
    def compute_metrics(self, results_df: pd.DataFrame) -> MQAMetrics:
        """Parity `evaluation_framework.py:247-345`."""
        all_metrics = []
        by_type = defaultdict(list)
        by_tag = defaultdict(list)

        tag_hits: Dict[str, List[float]] = defaultdict(list)
        for _, row in results_df.iterrows():
            try:
                pred = self.parse_tags_from_answer(row["predicted_answer"])
                gt = self.parse_ground_truth_answer(row["ground_truth_answer"])
                m = self.compare_answers(pred["objects"], gt["objects"])
                for kind, hit in _tag_content_hits(pred, gt).items():
                    tag_hits[kind].append(hit)
                all_metrics.append(m)
                by_type[row["question_type"]].append(m)
                qtags = self.parse_tags_from_question(row["question"])
                for t in qtags["obj"]:
                    by_tag[f"obj:{normalize_object_name(t)}"].append(m)
                for t in qtags["cam"]:
                    by_tag[f"cam:{t}"].append(m)
                for t in qtags["dst"]:
                    by_tag[f"dst:{t}"].append(m)
                for t in qtags["loc"]:
                    by_tag[f"loc:{t}"].append(m)
            except Exception as e:  # continue-on-error parity
                print(f"  evaluator: error on row: {e}")
                continue

        if not all_metrics:
            return MQAMetrics(0.0, {}, 0.0, 0.0, 0, 0, {})

        exact = sum(m["exact_match"] for m in all_metrics)
        total = len(all_metrics)
        per_type = {}
        for qtype, ms in by_type.items():
            per_type[qtype] = {
                "accuracy": sum(m["exact_match"] for m in ms) / len(ms),
                "count_accuracy": float(np.mean([m["count_match"] for m in ms])),
                "object_accuracy": float(np.mean([m["object_match"] for m in ms])),
                "num_questions": len(ms),
            }
        per_tag = {
            tag: {"accuracy": sum(m["exact_match"] for m in ms) / len(ms),
                  "count": len(ms)}
            for tag, ms in by_tag.items()
        }
        return MQAMetrics(
            overall_accuracy=exact / total,
            per_question_type=per_type,
            count_accuracy=float(np.mean([m["count_match"] for m in all_metrics])),
            object_accuracy=float(np.mean([m["object_match"] for m in all_metrics])),
            total_questions=total,
            correct_answers=int(exact),
            per_tag_accuracy=per_tag,
            tag_content_accuracy={k: float(np.mean(v))
                                  for k, v in tag_hits.items()},
        )

    # -- reporting ---------------------------------------------------------
    @staticmethod
    def print_results(metrics: MQAMetrics):
        print("=" * 80)
        print("nuScenes-MQA EVALUATION RESULTS")
        print("=" * 80)
        print(f"Total Questions: {metrics.total_questions}")
        print(f"Correct Answers: {metrics.correct_answers}")
        print(f"Overall Accuracy: {metrics.overall_accuracy:.2%}")
        print(f"Count Accuracy: {metrics.count_accuracy:.2%}")
        print(f"Object Accuracy: {metrics.object_accuracy:.2%}")
        if metrics.per_question_type:
            print(f"\n{'Question Type':<50} {'Accuracy':<12} {'Count':<8}")
            print("-" * 70)
            for qtype, qm in sorted(metrics.per_question_type.items()):
                print(f"{qtype:<50} {qm['accuracy']:<12.2%} "
                      f"{qm['num_questions']:<8}")
        if metrics.per_tag_accuracy:
            print(f"\nPer Tag (Top 20):")
            top = sorted(metrics.per_tag_accuracy.items(),
                         key=lambda kv: kv[1]["count"], reverse=True)[:20]
            for tag, tm in top:
                print(f"{tag:<40} {tm['accuracy']:<12.2%} {tm['count']:<8}")
        print("=" * 80)
