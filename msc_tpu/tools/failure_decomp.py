"""Failure decomposition for held-out MQA result CSVs.

Classifies every WRONG answer in a runner results CSV (the parity
schema of `eval/runner.py`; reference `src/evaluation_framework.py`
writes the same row shape) by recomputing, from that row's OWN caption,
what the deterministic analytic teacher would answer:

  * ``read``         — the caption's facts were sufficient and correct
                       (the analytic teacher answers the question right
                       from the same prompt), yet the model contradicted
                       them.  Reading/copy-fidelity failure: the lever
                       is a stronger reader or more copy curriculum.
  * ``wrong_fact``   — the caption itself carries a wrong fact (the
                       analytic teacher answers wrong too, but emits an
                       answer).  Upstream pipeline failure (e.g. cluster
                       misclassification); no reader can fix it.
  * ``missing_fact`` — the caption carries no usable fact for the
                       question (no fact line, no marker objects).
                       Retrieval-channel gap.

``read`` failures are further split by what the constrained-template
decoder (agents/caption.py mqa_response_format) can reach:

  * ``read/format`` — the predicted <cnt> matches GT (or the GT has no
                      <cnt>) but the object echo or tag skeleton is
                      wrong/garbled — unreachable under
                      MSC_MQA_TEMPLATE=1.
  * ``read/value``  — the model chose a wrong number/value in the free
                      slot; only training (or a bigger reader) helps.

This is the committed form of the round-4 ad-hoc analysis behind
RESULTS.md "Where every failure lives" (185 read / 128 wrong-fact /
0 missing-fact for r12) — the numbers that pick each round's training
levers.  Usage:

    python -m msc_tpu.tools.failure_decomp <results.csv> [--examples N]

CPU-only: the analytic teacher is LLM-free; no TPU client is opened.
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter, defaultdict
from typing import Dict


def _exact(evaluator, pred_text: str, gt_text: str) -> bool:
    pred = evaluator.parse_tags_from_answer(pred_text)
    gt = evaluator.parse_ground_truth_answer(gt_text)
    m = evaluator.compare_answers(pred["objects"], gt["objects"])
    return m["exact_match"] == 1.0


_COLS = ("read/format", "read/value", "wrong_fact", "missing_fact")


def decompose(csv_path: str, examples: int = 3) -> Dict[str, int]:
    import pandas as pd

    from msc_tpu.agents.caption import build_mqa_messages
    from msc_tpu.eval.evaluator import ComprehensiveMQAEvaluator
    from msc_tpu.serving.analytic import AnalyticBackend, question_facts

    df = pd.read_csv(csv_path)
    ev = ComprehensiveMQAEvaluator(mqa_df=df.rename(
        columns={"ground_truth_answer": "answer"})[
        ["sample_token", "question", "answer", "question_type"]])
    teacher = AnalyticBackend()

    classes: Counter = Counter()
    by_type: Dict[str, Counter] = defaultdict(Counter)
    by_config: Dict[str, Counter] = defaultdict(Counter)
    shown: Counter = Counter()

    n_wrong = 0
    for _, row in df.iterrows():
        q = str(row["question"])
        gt = str(row["ground_truth_answer"])
        pred = str(row.get("predicted_answer", ""))
        if _exact(ev, pred, gt):
            continue
        n_wrong += 1
        caption = {"full_caption": str(row.get("final_scene_caption", ""))}
        messages = build_mqa_messages(q, caption)
        try:
            analytic = teacher.complete(messages, 0.0, task="mqa_answer")
        except Exception as e:  # continue-on-error parity with the runner
            analytic = f"<error: {e}>"
        if _exact(ev, analytic, gt):
            # template-reachability split: right number in the free slot
            # but wrong echo/skeleton is a format failure the constrained
            # decoder eliminates; a wrong number is a true value failure
            import re as _re

            def _cnt(s):
                m = _re.search(r"<cnt>(\d+)</cnt>", s, _re.IGNORECASE)
                return m.group(1) if m else None

            # run the regex on the FULL GT string: truncating at ':'
            # would silently drop the <cnt> (misclassifying the row as
            # read/format) for any answer form containing a colon before
            # the tag (round-4 advisor finding)
            gt_cnt = _cnt(gt)
            cls = ("read/value" if (gt_cnt is not None
                                    and _cnt(pred) != gt_cnt)
                   else "read/format")
        else:
            # the caption couldn't answer the question: wrong facts if it
            # carried ANY usable facts (fact line or marker objects),
            # missing facts if the retrieval channel was empty
            from msc_tpu.serving.analytic import marker_objects

            has_facts = (question_facts(q, caption) is not None
                         or bool(marker_objects(caption["full_caption"])))
            cls = "wrong_fact" if has_facts else "missing_fact"
        classes[cls] += 1
        by_type[str(row.get("question_type", "?"))][cls] += 1
        by_config[str(row.get("config_name", "?"))][cls] += 1
        if shown[cls] < examples:
            shown[cls] += 1
            print(f"--- {cls} example ({row.get('question_type')}, "
                  f"{row.get('config_name')}):\n"
                  f"  Q: {q}\n  GT: {gt}\n  model: {pred}\n"
                  f"  analytic-from-caption: {analytic}", file=sys.stderr)

    total = len(df)
    print(f"\n{csv_path}: {total} questions, {n_wrong} wrong "
          f"({(total - n_wrong) / max(1, total):.2%} exact)")
    print(f"\n{'class':<14} {'n':>6}   share of failures")
    print("-" * 44)
    for cls, n in classes.most_common():
        print(f"{cls:<14} {n:>6}   {n / max(1, n_wrong):.1%}")
    print(f"\n{'question type':<22} " + " ".join(
        f"{c:>12}" for c in _COLS))
    print("-" * 62)
    for qtype in sorted(by_type):
        c = by_type[qtype]
        print(f"{qtype:<22} " + " ".join(
            f"{c.get(k, 0):>12}" for k in _COLS))
    print(f"\n{'config':<22} " + " ".join(
        f"{c:>12}" for c in _COLS))
    print("-" * 62)
    for cfg in sorted(by_config):
        c = by_config[cfg]
        print(f"{cfg:<22} " + " ".join(
            f"{c.get(k, 0):>12}" for k in _COLS))
    return dict(classes)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("csv")
    ap.add_argument("--examples", type=int, default=3,
                    help="stderr examples per class")
    args = ap.parse_args()
    decompose(args.csv, examples=args.examples)


if __name__ == "__main__":
    main()
