"""Learning-curve analysis from run history.

Rebuild of ``6_Utils/learning_curves.py``: history loading from the RunLogger
JSONL, from checkpoint meta files, from the wandb API
(``learning_curves.py:59-124``), from CSV/TSV log files (:197-223), and from
plain-text logs via key=value regex; best-epoch identification, summary
stats, multi-run comparison.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

# "key=value" / "key: value" tokens on a log line, e.g.
# "[log] epoch=3 train/loss=0.41 val/f1_macro=0.87".
_KV_RE = re.compile(r"([A-Za-z_][\w./-]*)\s*[=:]\s*([-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)")


class LearningCurveAnalyzer:
    def __init__(self, history: List[Dict]):
        self.history = history

    @classmethod
    def from_jsonl(cls, path) -> "LearningCurveAnalyzer":
        lines = Path(path).read_text().splitlines()
        return cls([json.loads(line) for line in lines if line.strip()])

    @classmethod
    def from_checkpoint_meta(cls, ckpt_dir) -> "LearningCurveAnalyzer":
        """Minimal history from checkpoint meta files (best epochs only)."""
        recs = []
        for p in sorted(Path(ckpt_dir).glob("*.meta.json")):
            recs.append(json.loads(p.read_text()))
        return cls(recs)

    @classmethod
    def from_wandb(cls, project: str, run_name: str,
                   entity: Optional[str] = None) -> Optional["LearningCurveAnalyzer"]:
        """History via the wandb API (learning_curves.py:59-124 role).

        Returns None with a warning when wandb is unavailable or the run is
        not found (the reference's graceful-degradation contract).
        """
        try:
            import wandb
        except ImportError:
            print("[learning_curves] wandb not installed; cannot fetch history")
            return None
        try:
            api = wandb.Api()
            path = f"{entity}/{project}" if entity else project
            for run in api.runs(path):
                if run.name == run_name:
                    hist = run.history()
                    recs = hist.to_dict("records") if hasattr(hist, "to_dict") else list(hist)
                    return cls([{k: v for k, v in r.items() if v == v} for r in recs])
            print(f"[learning_curves] run {run_name!r} not found in {path!r}")
            return None
        except Exception as e:
            print(f"[learning_curves] wandb fetch failed: {e}")
            return None

    @classmethod
    def from_csv_log(cls, path, delimiter: str = ",") -> "LearningCurveAnalyzer":
        """History from a CSV/TSV metrics log (learning_curves.py:197-223 role)."""
        import csv

        with open(path, newline="") as f:
            rows = list(csv.DictReader(f, delimiter=delimiter))
        recs = []
        for row in rows:
            rec = {}
            for k, v in row.items():
                try:
                    rec[k] = float(v)
                except (TypeError, ValueError):
                    rec[k] = v
            recs.append(rec)
        return cls(recs)

    @classmethod
    def from_text_log(cls, path, epoch_key: str = "epoch") -> "LearningCurveAnalyzer":
        """History from a plain-text training log via key=value/key: value
        regex; one record per line that carries at least one numeric metric."""
        recs = []
        for line in Path(path).read_text().splitlines():
            kv = {k: float(v) for k, v in _KV_RE.findall(line)}
            if kv:
                if epoch_key in kv:
                    kv[epoch_key] = int(kv[epoch_key])
                recs.append(kv)
        return cls(recs)

    def series(self, key: str):
        epochs, vals = [], []
        for rec in self.history:
            if key in rec:
                epochs.append(rec.get("epoch", len(epochs)))
                vals.append(rec[key])
        return np.asarray(epochs), np.asarray(vals, dtype=np.float64)

    def best_epoch(self, key: str = "val/f1_macro", greater_is_better: bool = True):
        epochs, vals = self.series(key)
        if len(vals) == 0:
            return None
        idx = int(np.argmax(vals) if greater_is_better else np.argmin(vals))
        return {"epoch": int(epochs[idx]), key: float(vals[idx])}

    def summary(self) -> Dict:
        keys = sorted({k for rec in self.history for k in rec
                       if isinstance(rec.get(k), (int, float)) and k != "time"})
        out = {}
        for k in keys:
            _, vals = self.series(k)
            if len(vals):
                out[k] = {"first": float(vals[0]), "last": float(vals[-1]),
                          "min": float(vals.min()), "max": float(vals.max())}
        return out


def compare_training_histories(analyzers: Dict[str, LearningCurveAnalyzer],
                               key: str = "val/f1_macro") -> Dict[str, Dict]:
    return {name: (a.best_epoch(key) or {}) for name, a in analyzers.items()}
