"""Learning-curve analysis from run history.

Rebuild of ``6_Utils/learning_curves.py``: history loading (here from the
RunLogger JSONL instead of wandb/log-regex), best-epoch identification,
summary stats, multi-run comparison.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


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
