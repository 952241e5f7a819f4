"""Orbax checkpointing: {params, opt_state, step, best_metric, config}.

Rebuild of the reference checkpoint policy (SURVEY.md §5.4,
train_gaze_earlyfusion.py:143-187, train_art.py:464-491): best-by-metric
``best`` checkpoint + periodic epoch checkpoints, with the training config
embedded so analysis can reconstruct the exact model from the checkpoint
alone (analyze_eeg.py:105-171 behavior).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, metric_greater_is_better: bool = True):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.greater_is_better = metric_greater_is_better
        self.best_metric: Optional[float] = None
        self._ckpt = ocp.StandardCheckpointer()
        self._last_config: Optional[Dict] = None
        best_file = self.directory / "best_metric.json"
        if best_file.exists():
            self.best_metric = json.loads(best_file.read_text())["best_metric"]

    def _is_better(self, metric: float) -> bool:
        if self.best_metric is None:
            return True
        return metric > self.best_metric if self.greater_is_better else metric < self.best_metric

    def _save(self, name: str, state, config: Optional[Dict] = None, extra: Optional[Dict] = None):
        if config is None:
            config = self._last_config  # reuse the run's config on later saves
        else:
            self._last_config = config
        path = self.directory / name
        payload = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(state.step),
        }
        self._ckpt.save(path, payload, force=True)
        self._ckpt.wait_until_finished()  # async save must not race process exit
        meta = {"config": config or {}, **(extra or {})}
        (self.directory / f"{name}.meta.json").write_text(json.dumps(meta, default=str))

    def save_periodic(self, epoch: int, state, config=None, extra=None):
        self._save(f"checkpoint_epoch_{epoch}", state, config, extra)

    def save_if_best(self, metric: float, state, config=None, extra=None) -> bool:
        if self._is_better(metric):
            self.best_metric = float(metric)
            self._save("best_model", state, config,
                       {**(extra or {}), "best_metric": self.best_metric})
            (self.directory / "best_metric.json").write_text(
                json.dumps({"best_metric": self.best_metric})
            )
            return True
        return False

    def restore(self, name: str, state):
        """Restore into an existing state template (shapes/dtypes must match)."""
        path = self.directory / name
        template = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(state.step),
        }
        restored = self._ckpt.restore(path, template)
        return state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )

    def load_meta(self, name: str) -> Dict:
        p = self.directory / f"{name}.meta.json"
        return json.loads(p.read_text()) if p.exists() else {}

    def latest_epoch(self) -> Optional[int]:
        epochs = []
        for p in self.directory.glob("checkpoint_epoch_*"):
            if p.is_dir():
                try:
                    epochs.append(int(p.name.rsplit("_", 1)[1]))
                except ValueError:
                    pass
        return max(epochs) if epochs else None
