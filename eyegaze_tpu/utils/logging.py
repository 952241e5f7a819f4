"""Run logging: wandb-style scalar dicts to stdout + JSONL + optional wandb.

The reference logs per-epoch scalar dicts to wandb
(train_multimodal_fuzzy_fusion.py:858-883); here every run always writes a
local JSONL history (consumed by the learning-curve analyzer) and wandb is
used only if installed AND enabled.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class RunLogger:
    def __init__(self, output_dir: str | Path, run_name: str = "run",
                 use_wandb: bool = False, wandb_kwargs: Optional[Dict] = None):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / f"{run_name}.jsonl"
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(**(wandb_kwargs or {}))
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict):
        rec = {"time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=float) + "\n")
        parts = [f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                 for k, v in metrics.items()]
        print("[log] " + " ".join(parts), flush=True)
        if self._wandb is not None:
            self._wandb.log(metrics)

    def history(self):
        if not self.path.exists():
            return []
        return [json.loads(line) for line in self.path.read_text().splitlines()]

    def log_watch(self, record: Dict):
        """Histogram records (large) go to a sidecar JSONL, not stdout."""
        path = self.path.with_name(self.path.stem + "_watch.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
        if self._wandb is not None:
            self._wandb.log(record)


def tree_histograms(tree, bins: int = 20, prefix: str = "") -> Dict:
    """Per-leaf histograms of a parameter/gradient pytree.

    The wandb.watch(model, log='all') equivalent
    (train_gaze_earlyfusion.py:458): for every leaf, a fixed-bin histogram
    plus l2/mean/std summary, keyed by the flattened parameter path.
    """
    import jax
    import numpy as np

    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        name = prefix + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = np.asarray(leaf).ravel()
        counts, edges = np.histogram(arr, bins=bins)
        out[name] = {
            "counts": counts.tolist(),
            "edges": [float(edges[0]), float(edges[-1])],
            "l2": float(np.linalg.norm(arr)),
            "mean": float(arr.mean()),
            "std": float(arr.std()),
        }
    return out
