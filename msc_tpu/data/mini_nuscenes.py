"""Devkit-free nuScenes table reader.

The reference hard-depends on ``nuscenes-devkit`` (`src/nuscenes_loader.py:
15-207`); when the devkit is absent it can only fall back to mock data —
so its real-data path is untestable without the full dependency stack.
``MiniNuScenes`` implements the small devkit surface the loader actually
uses (``scene``, ``get(table, token)``, ``box_velocity``) directly from
the dataset's raw JSON tables, including the derived fields the devkit
computes at load time:

  * ``sample["data"]``: channel -> key-frame sample_data token
    (via calibrated_sensor -> sensor.channel);
  * ``sample["anns"]``: annotation tokens per sample;
  * ``sample_annotation["category_name"]``: via instance -> category.

This makes real-dataset ingestion a first-class, hermetically testable
path: tests synthesize a miniature dataset on disk and run the REAL
loader code over it (tests/test_data.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List

import numpy as np

_TABLES = ("scene", "sample", "sample_data", "sample_annotation",
           "calibrated_sensor", "sensor", "ego_pose", "log",
           "attribute", "visibility", "instance", "category")


class MiniNuScenes:
    """Minimal stand-in for ``nuscenes.NuScenes`` (read-only tables)."""

    def __init__(self, version: str = "v1.0-mini", dataroot: str = ".",
                 verbose: bool = False):
        self.version = version
        self.dataroot = Path(dataroot)
        table_dir = self.dataroot / version
        self._tables: Dict[str, Dict[str, dict]] = {}
        for name in _TABLES:
            path = table_dir / f"{name}.json"
            rows = json.loads(path.read_text()) if path.exists() else []
            self._tables[name] = {r["token"]: r for r in rows}

        self.scene: List[dict] = list(self._tables["scene"].values())

        # -- derived fields (the devkit computes these at load) ----------
        cat_by_instance = {
            tok: self._tables["category"].get(
                inst["category_token"], {}).get("name", "unknown")
            for tok, inst in self._tables["instance"].items()}
        for ann in self._tables["sample_annotation"].values():
            ann.setdefault("category_name",
                           cat_by_instance.get(ann.get("instance_token", ""),
                                               "unknown"))

        for s in self._tables["sample"].values():
            s.setdefault("data", {})
            s.setdefault("anns", [])
        for sd in self._tables["sample_data"].values():
            if not sd.get("is_key_frame", True):
                continue
            cs = self._tables["calibrated_sensor"].get(
                sd["calibrated_sensor_token"], {})
            sensor = self._tables["sensor"].get(cs.get("sensor_token", ""), {})
            channel = sd.get("channel") or sensor.get("channel")
            if channel:
                sd["channel"] = channel
                sample = self._tables["sample"].get(sd["sample_token"])
                if sample is not None:
                    sample["data"][channel] = sd["token"]
        for ann in self._tables["sample_annotation"].values():
            sample = self._tables["sample"].get(ann["sample_token"])
            if sample is not None:
                sample["anns"].append(ann["token"])

    # -- devkit API subset --------------------------------------------------
    def get(self, table: str, token: str) -> dict:
        return self._tables[table][token]

    def box_velocity(self, ann_token: str) -> np.ndarray:
        """Finite-difference velocity from the annotation's instance
        neighbors (devkit semantics: prev..next over sample timestamps;
        NaN when the annotation has no temporal neighbors)."""
        ann = self.get("sample_annotation", ann_token)

        def pos_t(a):
            t = self.get("sample", a["sample_token"])["timestamp"] * 1e-6
            return np.asarray(a["translation"], np.float64), t

        first, last = ann, ann
        if ann.get("prev"):
            first = self.get("sample_annotation", ann["prev"])
        if ann.get("next"):
            last = self.get("sample_annotation", ann["next"])
        if first is last:
            return np.full(3, np.nan)
        p0, t0 = pos_t(first)
        p1, t1 = pos_t(last)
        if t1 <= t0:
            return np.full(3, np.nan)
        return (p1 - p0) / (t1 - t0)
