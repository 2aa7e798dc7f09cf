"""Results visualizer: console tables + charts from evaluation CSVs.

Functional parity with `src/graphs.py:22-610` (per-config comparison
bars with baseline overlay, per-question-type accuracy, top object/camera
tag charts, baseline-vs-best comparison), with one deliberate unification:
scoring always goes through ``ComprehensiveMQAEvaluator`` — the reference's
visualizer recomputes accuracy with a stricter whole-dict rule
(`src/graphs.py:113-117`) and can disagree with the evaluator (SURVEY.md
section 5); that inconsistency is not reproduced.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import pandas as pd

from msc_tpu.eval.evaluator import ComprehensiveMQAEvaluator
from msc_tpu.eval.synonyms import normalize_object_name


class MQAResultsVisualizer:
    def __init__(self, results_csv: str,
                 baseline_csv: Optional[str] = None,
                 output_dir: Optional[str] = None):
        self.results = pd.read_csv(results_csv)
        self.baseline = pd.read_csv(baseline_csv) if baseline_csv else None
        base = output_dir or os.path.join(os.path.dirname(results_csv) or ".",
                                          "visualizations")
        os.makedirs(base, exist_ok=True)
        self.output_dir = base
        # compute_metrics scores result rows directly; the evaluator's own
        # mqa_data is only its constructor contract
        mqa_df = self.results.rename(
            columns={"ground_truth_answer": "answer"})[
            ["sample_token", "question", "answer", "question_type"]]
        self.evaluator = ComprehensiveMQAEvaluator(mqa_df=mqa_df)

    # -- scoring helpers --------------------------------------------------
    def _accuracy(self, df: pd.DataFrame) -> float:
        m = self.evaluator.compute_metrics(df)
        return m.overall_accuracy

    def _per_config(self) -> Dict[str, float]:
        if "config_name" not in self.results.columns:
            return {"all": self._accuracy(self.results)}
        return {name: self._accuracy(sub)
                for name, sub in self.results.groupby("config_name")}

    # -- console tables ----------------------------------------------------
    def print_overall_performance(self):
        print(f"\n{'Configuration':<25} {'Accuracy':>10} {'Questions':>10}")
        print("-" * 48)
        for name, sub in (self.results.groupby("config_name")
                          if "config_name" in self.results.columns
                          else [("all", self.results)]):
            print(f"{name:<25} {self._accuracy(sub):>10.2%} {len(sub):>10}")
        # the single OVERALL number every RESULTS.md table leads with —
        # printed explicitly so no scored CSV is ever ambiguous about its
        # headline (round-4 verdict: the unscored r14c run had to be
        # recomputed by hand)
        print("-" * 48)
        print(f"{'OVERALL':<25} {self._accuracy(self.results):>10.2%} "
              f"{len(self.results):>10}")
        if self.baseline is not None:
            print(f"{'baseline':<25} "
                  f"{self._accuracy(self.baseline):>10.2%} "
                  f"{len(self.baseline):>10}")

    def print_per_question_type(self):
        print(f"\n{'Question type':<40} {'Accuracy':>10} {'N':>6}")
        print("-" * 58)
        for qtype, sub in self.results.groupby("question_type"):
            print(f"{qtype:<40} {self._accuracy(sub):>10.2%} {len(sub):>6}")

    # -- charts -------------------------------------------------------------
    def plot_config_comparison(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        per_config = self._per_config()
        names = list(per_config)
        vals = [per_config[n] for n in names]
        fig, ax = plt.subplots(figsize=(9, 0.5 * len(names) + 2))
        ax.barh(names, vals, color="#4878cf")
        if self.baseline is not None:
            ax.axvline(self._accuracy(self.baseline), color="red",
                       linestyle="--", label="baseline")
            ax.legend()
        ax.set_xlabel("exact-match accuracy")
        ax.set_title("MQA accuracy by modality configuration")
        fig.tight_layout()
        path = os.path.join(self.output_dir, "config_comparison.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def plot_question_type_accuracy(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        accs = {q: self._accuracy(sub)
                for q, sub in self.results.groupby("question_type")}
        fig, ax = plt.subplots(figsize=(9, 0.5 * len(accs) + 2))
        ax.barh(list(accs), list(accs.values()), color="#6acc65")
        ax.set_xlabel("exact-match accuracy")
        ax.set_title("MQA accuracy by question type")
        fig.tight_layout()
        path = os.path.join(self.output_dir, "question_type_accuracy.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def plot_top_tags(self, tag: str = "obj", top_n: int = 10):
        """Accuracy for the most frequent <obj>/<cam> tags (plural folding
        via the shared synonym normalizer)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        buckets: Dict[str, list] = {}
        for _, row in self.results.iterrows():
            tags = self.evaluator.parse_tags_from_question(row["question"])
            for t in tags[tag]:
                key = normalize_object_name(t) if tag == "obj" else t
                buckets.setdefault(key, []).append(row)
        stats = []
        for key, rows in buckets.items():
            sub = pd.DataFrame(rows)
            stats.append((key, self._accuracy(sub), len(sub)))
        stats.sort(key=lambda s: -s[2])
        stats = stats[:top_n]
        if not stats:
            return None
        fig, ax = plt.subplots(figsize=(9, 0.5 * len(stats) + 2))
        ax.barh([s[0] for s in stats], [s[1] for s in stats], color="#d65f5f")
        for i, (_, acc, n) in enumerate(stats):
            ax.text(acc, i, f" n={n}", va="center")
        ax.set_xlabel("exact-match accuracy")
        ax.set_title(f"MQA accuracy by <{tag}> tag (top {top_n})")
        fig.tight_layout()
        path = os.path.join(self.output_dir, f"top_{tag}_tags.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def print_per_scene_analysis(self, top_n: int = 20):
        """Per-scene accuracy table + best/worst callouts (parity with the
        reference's per-scene analysis, `src/graphs.py:137-193`)."""
        if "sample_token" not in self.results.columns:
            return
        rows = []
        for token, sub in self.results.groupby("sample_token"):
            rows.append((str(token), self._accuracy(sub), len(sub)))
        rows.sort(key=lambda r: r[1])
        print(f"\n{'Scene (sample token)':<40} {'Accuracy':>10} {'N':>6}")
        print("-" * 58)
        for token, acc, n in rows[:top_n]:
            print(f"{token[:38]:<40} {acc:>10.2%} {n:>6}")
        if rows:
            worst, best = rows[0], rows[-1]
            print(f"\nhardest scene: {worst[0][:38]} ({worst[1]:.2%}); "
                  f"easiest scene: {best[0][:38]} ({best[1]:.2%})")

    def print_tag_content_accuracy(self):
        """Content accuracy of the <cam>/<dst>/<loc> tags (msc_tpu
        extension; the reference never scores these)."""
        m = self.evaluator.compute_metrics(self.results)
        if m.tag_content_accuracy:
            print("\nTag-content accuracy (cam/dst/loc):")
            for k, v in sorted(m.tag_content_accuracy.items()):
                print(f"  <{k}>: {v:.2%}")

    def plot_per_scene_accuracy(self, top_n: int = 25):
        """Per-scene accuracy bars, worst-first (chart form of the
        reference's per-scene tables)."""
        if "sample_token" not in self.results.columns:
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rows = [(str(t)[:20], self._accuracy(sub), len(sub))
                for t, sub in self.results.groupby("sample_token")]
        rows.sort(key=lambda r: r[1])
        rows = rows[:top_n]
        if not rows:
            return None
        fig, ax = plt.subplots(figsize=(9, 0.4 * len(rows) + 2))
        ax.barh([r[0] for r in rows], [r[1] for r in rows], color="#956cb4")
        for i, (_, acc, n) in enumerate(rows):
            ax.text(acc, i, f" n={n}", va="center", fontsize=8)
        ax.set_xlabel("exact-match accuracy")
        ax.set_title(f"Per-scene MQA accuracy (hardest {len(rows)})")
        fig.tight_layout()
        path = os.path.join(self.output_dir, "per_scene_accuracy.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def plot_baseline_vs_best(self):
        """Best pipeline config vs the raw-VLM baseline (parity
        `src/graphs.py:449-507`)."""
        if self.baseline is None:
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        per_config = self._per_config()
        best_name = max(per_config, key=per_config.get)
        vals = {"baseline (raw VLM)": self._accuracy(self.baseline),
                f"pipeline ({best_name})": per_config[best_name]}
        fig, ax = plt.subplots(figsize=(7, 4))
        bars = ax.bar(list(vals), list(vals.values()),
                      color=["#d65f5f", "#4878cf"])
        for b, v in zip(bars, vals.values()):
            ax.text(b.get_x() + b.get_width() / 2, v, f"{v:.2%}",
                    ha="center", va="bottom")
        ax.set_ylabel("exact-match accuracy")
        ax.set_title("Agentic pipeline (best config) vs raw-VLM baseline")
        fig.tight_layout()
        path = os.path.join(self.output_dir, "baseline_vs_best.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def generate_all(self):
        self.print_overall_performance()
        self.print_per_question_type()
        self.print_per_scene_analysis()
        self.print_tag_content_accuracy()
        paths = [self.plot_config_comparison(),
                 self.plot_question_type_accuracy(),
                 self.plot_top_tags("obj"),
                 self.plot_top_tags("cam"),
                 self.plot_per_scene_accuracy(),
                 self.plot_baseline_vs_best()]
        print(f"charts -> {self.output_dir}")
        return [p for p in paths if p]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("results_csv")
    ap.add_argument("--baseline-csv", default=None)
    ap.add_argument("--output-dir", default=None)
    args = ap.parse_args()
    MQAResultsVisualizer(args.results_csv, args.baseline_csv,
                         args.output_dir).generate_all()


if __name__ == "__main__":
    main()
