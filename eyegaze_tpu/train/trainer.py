"""Generic jit training loop: one compiled train_step + eval_step per run.

Covers the roles of the reference's four trainer scripts (SURVEY.md §2.4):
epoch loop with multi-loss objectives, grad clipping, LR schedules, eval
metrics on device, best-by-F1 + periodic orbax checkpointing, resume, and
CSV/stdout logging (wandb-style scalar dicts via the logging utils).

bf16 note: models run compute in bf16 when built with dtype=jnp.bfloat16
(the AMP equivalent, train_gaze_earlyfusion.py:425-427); parameters and the
optimizer stay f32.  No GradScaler is needed — bf16 has f32's exponent range.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from eyegaze_tpu.train.checkpoint import CheckpointManager
from eyegaze_tpu.train.metrics import classification_metrics
from eyegaze_tpu.train.state import TrainState, training_prng_key


@dataclasses.dataclass
class TrainerConfig:
    num_epochs: int = 10
    log_every: int = 10
    eval_every_epochs: int = 1
    save_every_epochs: int = 10
    metric_for_best: str = "f1_macro"
    greater_is_better: bool = True
    checkpoint_dir: Optional[str] = None
    seed: int = 42
    # Falsy = single device.  True / "dp" = 1-D data-parallel mesh over all
    # local devices.  A spec like "dp4,tp2" or "tp2" adds a tensor-parallel
    # model axis: transformer matmul weights (and their Adam moments) shard
    # Megatron-style over it (parallel/sharding.py), batches shard over the
    # data axis, and XLA inserts every collective.
    use_mesh: Any = False
    # wandb.watch equivalent: every N epochs, log parameter + gradient
    # histograms (one extra grad computation on the epoch's last batch).
    # 0 disables.  Needs a watch_logger on the Trainer.
    watch_every_epochs: int = 0
    # Host->device batches kept in flight (async device_put) so transfer of
    # batch k+1 overlaps compute of batch k.  0 disables.
    prefetch: int = 2


class Trainer:
    """Drives (train_batches, eval_batches) epochs over a jit step pair.

    loss_fn(params, batch, rng, step) -> (loss, aux_dict) where aux must
    contain 'logits'; eval uses the model's deterministic logits via
    eval_logits_fn(params, batch) -> logits.
    """

    def __init__(
        self,
        state: TrainState,
        loss_fn: Callable,
        eval_logits_fn: Optional[Callable],
        config: TrainerConfig,
        num_classes: int = 3,
        logger: Optional[Callable[[Dict], None]] = None,
        eval_metrics_fn: Optional[Callable] = None,
        watch_logger: Optional[Callable[[Dict], None]] = None,
    ):
        """``eval_metrics_fn(params, batch) -> {name: scalar}`` replaces the
        classification eval for non-classification objectives (ART denoising:
        loss/SNR) — batch means are reported as ``val/<name>``.  Exactly one
        of eval_logits_fn / eval_metrics_fn should be provided."""
        self.config = config
        self.num_classes = num_classes
        self.logger = logger or (lambda d: None)
        self.mesh = None
        if config.use_mesh:
            from eyegaze_tpu.parallel.sharding import (
                make_mesh_2d, parse_mesh_spec, shard_tp)

            dp, tp = parse_mesh_spec(config.use_mesh)
            if tp > 1:
                self.mesh = make_mesh_2d(dp, tp)
                state = shard_tp(state, self.mesh)
            else:
                self.mesh = make_mesh(dp)
                state = replicate(state, self.mesh)
        self.state = state
        self.ckpt = (
            CheckpointManager(config.checkpoint_dir, config.greater_is_better)
            if config.checkpoint_dir
            else None
        )
        self.history: list[Dict] = []

        def train_step(state: TrainState, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, step_rng, state.step
            )
            new_state = state.apply_gradients(grads)
            # Global grad norm: the wandb.watch-style training-health signal
            # (train_gaze_earlyfusion.py:458 role) at negligible cost.
            grad_norm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads)))
            metrics = {"loss": loss, "grad_norm": grad_norm}
            if "logits" in aux and "label" in batch:
                preds = jnp.argmax(aux["logits"], axis=-1)
                metrics["correct"] = jnp.sum(preds == batch["label"])
                metrics["count"] = batch["label"].shape[0]
            for k, v in aux.items():
                if k.startswith("loss_"):
                    metrics[k] = v
            return new_state, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_logits_fn) if eval_logits_fn else None
        self._eval_metrics = jax.jit(eval_metrics_fn) if eval_metrics_fn else None
        self._rng = training_prng_key(config.seed)
        self.watch_logger = watch_logger
        self._last_batch = None
        if config.watch_every_epochs > 0:
            self._grad_fn = jax.jit(
                lambda p, batch, rng: jax.grad(
                    lambda pp: loss_fn(pp, batch, rng, 0)[0])(p))
        else:
            self._grad_fn = None

    def _per_host_rows(self) -> int:
        """Rows each host must contribute per global batch: the data-axis
        extent served by this host's devices (1 when single-process)."""
        return max(self.mesh.shape["data"] // jax.process_count(), 1)

    def _put(self, batch):
        if self.mesh is not None:
            if jax.process_count() > 1:
                # Multi-host SPMD: this process's batch is its HOST-LOCAL
                # shard of the global batch (parallel/multihost.py contract:
                # every process runs this same loop over its own slice of
                # the data); assemble the logical global array without any
                # host materializing the global batch.  Unlike the
                # single-process branch below there is NO replicate
                # fallback for stragglers — a ragged local batch would make
                # make_array_from_process_local_data raise mid-epoch
                # (round-5 review finding), so fail with the remedy:
                # train loops use drop_remainder=True, and evaluate()
                # pads/trims before reaching here.
                from eyegaze_tpu.parallel.multihost import host_local_to_global

                per = self._per_host_rows()
                leaves = jax.tree_util.tree_leaves(batch)
                if not all(np.ndim(l) > 0 and np.shape(l)[0] % per == 0
                           for l in leaves):
                    raise ValueError(
                        f"multi-host batch rows must be a multiple of "
                        f"{per} (data axis / process_count); use "
                        f"drop_remainder=True or the evaluate() pad path")
                return host_local_to_global(batch, self.mesh)
            n = self.mesh.shape["data"]  # batch divides the DATA axis only
            leaves = jax.tree_util.tree_leaves(batch)
            if leaves and all(
                    np.ndim(l) > 0 and np.shape(l)[0] % n == 0 for l in leaves):
                return shard_batch(batch, self.mesh)
            # Straggler batch (e.g. last eval batch) not divisible by the
            # mesh: replicate it — correct, just not data-parallel.
            return replicate(batch, self.mesh)
        return batch

    def _prefetched(self, batches):
        from eyegaze_tpu.data.prefetch import prefetch_to_device

        return prefetch_to_device(batches, self.config.prefetch, self._put)

    def train_epoch(self, batches: Iterator[Dict[str, np.ndarray]], epoch: int) -> Dict:
        totals: Dict[str, float] = {}
        n_batches = 0
        t0 = time.time()
        for batch in self._prefetched(batches):
            self.state, metrics = self._train_step(self.state, batch, self._rng)
            self._last_batch = batch
            n_batches += 1
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        dt = time.time() - t0
        out = {f"train/{k}": v / n_batches for k, v in totals.items()
               if k not in ("correct", "count")}
        if "count" in totals:
            out["train/accuracy"] = totals["correct"] / max(totals["count"], 1)
        out["train/epoch_time_s"] = dt
        out["epoch"] = epoch
        return out

    def evaluate(self, batches: Iterator[Dict[str, np.ndarray]]) -> Dict:
        if self._eval_metrics is not None:
            sums: Dict[str, float] = {}
            n = 0
            for batch in self._prefetched(batches):
                out = self._eval_metrics(self.state.params, batch)
                for k, v in out.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                n += 1
            return {f"val/{k}": v / max(n, 1) for k, v in sums.items()}
        all_logits = []
        all_labels = []
        multihost = self.mesh is not None and jax.process_count() > 1
        if multihost:
            # Per-host val shards (multihost.py): pad each local batch to
            # the per-host row multiple (a ragged straggler would crash
            # global assembly — round-5 review finding), run the global
            # step, fetch THIS host's rows trimmed back to the real count,
            # then gather across processes so every host scores the full
            # val set identically (SPMD eval contract).  No prefetch here:
            # correctness of the pad/trim pairing over pipelining.
            from eyegaze_tpu.parallel.multihost import fetch_local_shard

            per = self._per_host_rows()
            for batch in batches:
                n_valid = int(np.shape(jax.tree_util.tree_leaves(batch)[0])[0])
                pad = (-n_valid) % per
                if pad:
                    batch = jax.tree_util.tree_map(
                        lambda x: np.concatenate(
                            [np.asarray(x),
                             np.repeat(np.asarray(x)[-1:], pad, axis=0)]),
                        batch)
                dev = self._put(batch)
                logits = self._eval_step(self.state.params, dev)
                all_logits.append(fetch_local_shard(logits)[:n_valid])
                all_labels.append(fetch_local_shard(dev["label"])[:n_valid])
        else:
            for batch in self._prefetched(batches):
                logits = self._eval_step(self.state.params, batch)
                all_logits.append(np.asarray(logits))
                all_labels.append(np.asarray(batch["label"]))
        logits = np.concatenate(all_logits)
        labels = np.concatenate(all_labels)
        if multihost:
            from eyegaze_tpu.parallel.multihost import all_processes_concat

            logits = all_processes_concat(logits)
            labels = all_processes_concat(labels)
        preds = logits.argmax(axis=-1)
        m = classification_metrics(jnp.asarray(labels), jnp.asarray(preds), self.num_classes)
        return {f"val/{k}": (np.asarray(v) if k == "confusion_matrix" else float(v))
                for k, v in m.items() if not k.endswith("per_class")}

    def fit(
        self,
        train_batches_fn: Callable[[int], Iterator],
        eval_batches_fn: Optional[Callable[[], Iterator]] = None,
        config_dict: Optional[Dict] = None,
        start_epoch: int = 0,
    ) -> Dict:
        best = None
        for epoch in range(start_epoch, self.config.num_epochs):
            stats = self.train_epoch(train_batches_fn(epoch), epoch)
            if eval_batches_fn is not None and (epoch + 1) % self.config.eval_every_epochs == 0:
                stats.update(self.evaluate(eval_batches_fn()))
                metric = stats.get(f"val/{self.config.metric_for_best}")
                if metric is not None and self.ckpt is not None:
                    if self.ckpt.save_if_best(metric, self.state, config_dict,
                                              {"epoch": epoch}):
                        best = metric
            if self.ckpt is not None and (epoch + 1) % self.config.save_every_epochs == 0:
                self.ckpt.save_periodic(epoch, self.state, config_dict)
            if (self._grad_fn is not None and self.watch_logger is not None
                    and (epoch + 1) % self.config.watch_every_epochs == 0
                    and self._last_batch is not None):
                from eyegaze_tpu.utils.logging import tree_histograms

                grads = self._grad_fn(self.state.params,
                                      self._put(self._last_batch), self._rng)
                record = {"epoch": epoch}
                record.update(tree_histograms(self.state.params, prefix="param/"))
                record.update(tree_histograms(grads, prefix="grad/"))
                self.watch_logger(record)
            loggable = {k: v for k, v in stats.items() if not isinstance(v, np.ndarray)}
            self.logger(loggable)
            self.history.append(loggable)
        if best is None and self.ckpt is not None:
            best = self.ckpt.best_metric
        return {"best_metric": best, "history": self.history}
