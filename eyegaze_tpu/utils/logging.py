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
