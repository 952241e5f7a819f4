"""Multi-model comparison.

Rebuild of ``6_Utils/model_comparison.py``: ModelResults container, metric
table, ranking, pairwise significance tests (McNemar-style on per-sample
correctness), CSV + LaTeX emission.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


@dataclasses.dataclass
class ModelResults:
    name: str
    labels: np.ndarray
    preds: np.ndarray
    probs: Optional[np.ndarray] = None
    metadata: Optional[Dict] = None

    def metrics(self, num_classes: int = 3) -> Dict[str, float]:
        import jax.numpy as jnp

        from eyegaze_tpu.train.metrics import classification_metrics

        m = classification_metrics(
            jnp.asarray(self.labels), jnp.asarray(self.preds), num_classes
        )
        return {k: float(v) for k, v in m.items()
                if not hasattr(v, "shape") or v.ndim == 0}


class MultiModelComparator:
    def __init__(self, results: List[ModelResults], num_classes: int = 3):
        self.results = results
        self.num_classes = num_classes

    def metric_table(self) -> pd.DataFrame:
        rows = []
        for r in self.results:
            rows.append({"Model": r.name, **r.metrics(self.num_classes)})
        return pd.DataFrame(rows)

    def ranking(self, metric: str = "f1_macro") -> List[str]:
        df = self.metric_table().sort_values(metric, ascending=False)
        return df["Model"].tolist()

    def pairwise_significance(self) -> pd.DataFrame:
        """Exact binomial (McNemar) test on discordant predictions between
        each model pair (model_comparison.py:190-247 role)."""
        from scipy import stats as sstats

        rows = []
        for i, a in enumerate(self.results):
            for b in self.results[i + 1:]:
                assert len(a.labels) == len(b.labels), "misaligned result sets"
                ok_a = a.preds == a.labels
                ok_b = b.preds == b.labels
                n01 = int((ok_a & ~ok_b).sum())
                n10 = int((~ok_a & ok_b).sum())
                n = n01 + n10
                p = float(sstats.binomtest(min(n01, n10), n, 0.5).pvalue) if n else 1.0
                rows.append({
                    "Model_A": a.name, "Model_B": b.name,
                    "A_only_correct": n01, "B_only_correct": n10, "p_value": p,
                })
        return pd.DataFrame(rows)

    def to_csv(self, path) -> None:
        self.metric_table().to_csv(path, index=False)

    def to_latex(self, path, metric_cols=("accuracy", "precision_macro",
                                          "recall_macro", "f1_macro")) -> str:
        df = self.metric_table()[["Model", *metric_cols]]
        latex = df.to_latex(index=False, float_format="%.4f")
        with open(path, "w") as f:
            f.write(latex)
        return latex
