#!/usr/bin/env python
"""Train DualEEGTransformer — TPU-native rebuild of 4_Experiments/scripts/train_art.py.

Usage:
    python scripts/train_dual_eeg.py --config configs/dual_eeg_transformer.yaml
        [--resume] [--max-steps N] [--epochs N]

Config schema matches the reference YAML; with ``data.synthetic: true`` (or
when the real data paths are absent) training runs on the seeded synthetic
dual-EEG fixtures, which is also the driver-facing smoke path.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.config import ExperimentConfig, load_yaml_config
from eyegaze_tpu.data.loader import DualEEGWindowDataset
from eyegaze_tpu.data.metadata import stratified_split
from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset
from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
from eyegaze_tpu.train.losses import (
    cross_entropy,
    ibs_alignment_loss,
    ibs_contrastive_loss,
    symmetry_loss,
)
from eyegaze_tpu.train.optim import cosine_annealing_schedule, make_optimizer
from eyegaze_tpu.train.state import create_train_state
from eyegaze_tpu.train.trainer import Trainer, TrainerConfig
from eyegaze_tpu.utils.logging import RunLogger


def build_model(cfg: ExperimentConfig, dtype=jnp.float32) -> DualEEGTransformer:
    abl = cfg.ablation
    return DualEEGTransformer(
        in_channels=cfg.model.in_channels,
        num_classes=cfg.model.num_labels,
        d_model=cfg.model.d_model,
        num_layers=cfg.model.num_layers,
        num_heads=cfg.model.num_heads,
        d_ff=cfg.model.d_ff,
        dropout=cfg.training.dropout,
        max_len=max(cfg.data.window_size // 4, 256),
        conv_kernel_size=cfg.model.conv_kernel_size,
        conv_stride=cfg.model.conv_stride,
        conv_layers=cfg.model.conv_layers,
        sampling_rate=cfg.data.sampling_rate,
        use_spectrogram=abl.use_spectrogram,
        spec_n_fft=cfg.model.spec_n_fft,
        spec_hop_length=cfg.model.spec_hop_length,
        spec_freq_bins=cfg.model.spec_freq_bins,
        use_robust_ibs=(abl.ibs_mode == "robust"),
        use_ibs=abl.use_ibs,
        use_cross_attention=abl.use_cross_attention,
        ibs_instance_norm=abl.ibs_instance_norm,
        ibs_feature_type=abl.ibs_feature_type,
        dtype=dtype,
    )


def prepare_datasets(cfg: ExperimentConfig, process_shard: bool = False):
    """Trial-level arrays -> windowed train/val datasets (stratified split,
    seed from config — train_art.py:69-139 semantics).  ``process_shard``
    keeps only this process's trial slice (multi-host host-local loading).

    Real-data path: ``data.eeg_base_path`` pointing at the output of
    scripts/preprocess_eeg_raw.py ({train,val}_eeg{1,2}/labels/pairs.npy, or
    unsplit eeg1/eeg2/labels/pairs.npy which is then stratified-split here).
    Otherwise seeded synthetic fixtures.
    """
    d = cfg.data
    eeg_dir = Path(d.eeg_base_path) if d.eeg_base_path else None

    def windowed(e1, e2, labels, pairs):
        return DualEEGWindowDataset(e1, e2, labels, window_size=d.window_size,
                                    stride=d.stride, pairs=pairs)

    if eeg_dir and (eeg_dir / "train_eeg1.npy").exists():
        def load(split):
            return windowed(
                np.load(eeg_dir / f"{split}_eeg1.npy"),
                np.load(eeg_dir / f"{split}_eeg2.npy"),
                np.load(eeg_dir / f"{split}_labels.npy"),
                np.load(eeg_dir / f"{split}_pairs.npy")
                if (eeg_dir / f"{split}_pairs.npy").exists() else None,
            )
        print(f"[data] real pre-split npy from {eeg_dir}")
        return load("train"), load("val")

    if eeg_dir and (eeg_dir / "eeg1.npy").exists():
        print(f"[data] real unsplit npy from {eeg_dir}")
        data = {
            "eeg1": np.load(eeg_dir / "eeg1.npy"),
            "eeg2": np.load(eeg_dir / "eeg2.npy"),
            "label": np.load(eeg_dir / "labels.npy"),
            "pair": np.load(eeg_dir / "pairs.npy"),
        }
    else:
        data = synthetic_eeg_pair_dataset(
            n=d.synthetic_trials, C=cfg.model.in_channels,
            T=max(d.window_size, 1024), fs=d.sampling_rate, seed=d.random_seed,
        )
    idx = list(range(len(data["label"])))
    train_idx, val_idx = stratified_split(
        idx, data["label"], test_size=d.train_test_split, seed=d.random_seed
    )
    if process_shard:
        # Host-local loading (parallel/multihost.py contract): every process
        # computes the SAME global split (seeded above), then keeps only its
        # contiguous trial slice — no host loads the full dataset.  Trials
        # are trimmed to a multiple of process_count (drop-last, matching
        # the batch policy).  Single-process this is the identity.
        from eyegaze_tpu.parallel.multihost import process_shard_bounds

        pc = jax.process_count()

        def my_slice(ids):
            ids = list(ids)[:len(ids) - len(ids) % pc]
            lo, hi = process_shard_bounds(len(ids))
            return ids[lo:hi]

        train_idx, val_idx = my_slice(train_idx), my_slice(val_idx)

    def subset(ids):
        ids = np.asarray(ids)
        return windowed(data["eeg1"][ids], data["eeg2"][ids], data["label"][ids],
                        data["pair"][ids])

    return subset(train_idx), subset(val_idx)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--watch", type=int, default=0, metavar="N",
                    help="log param/grad histograms every N epochs "
                         "(wandb.watch role, train_gaze_earlyfusion.py:458)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--synthetic-trials", type=int, default=None)
    ap.add_argument("--mesh", nargs="?", const="dp", default=None,
                    help="device-mesh spec (system.mesh): 'dp' = data-parallel "
                         "over all local devices; 'dpN,tpM' / 'tpM' adds a "
                         "tensor-parallel model axis (Megatron-style weight "
                         "sharding, parallel/sharding.py)")
    ap.add_argument("--multihost", action="store_true",
                    help="join a multi-process (multi-host pod) run: "
                         "jax.distributed.initialize + host-local data "
                         "loading per process (parallel/multihost.py; "
                         "implies --mesh dp over the GLOBAL device set). "
                         "Single-process environments degrade to --mesh.")
    args = ap.parse_args(argv)

    if args.multihost:
        # Must precede any backend use; see parallel/multihost.py for the
        # contract and the tested-here caveat (this environment is
        # single-process, so >1-process behavior is contract-tested only).
        from eyegaze_tpu.parallel.multihost import initialize_multihost

        pi, pc = initialize_multihost()
        print(f"[multihost] process {pi}/{pc}, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
        args.mesh = args.mesh or "dp"

    cfg = load_yaml_config(args.config)
    if args.mesh:
        cfg.system.mesh = args.mesh  # 'dp' or a 2-D spec like 'dp4,tp2'
    if args.epochs is not None:
        cfg.training.num_train_epochs = args.epochs
    if args.batch_size is not None:
        cfg.training.per_device_train_batch_size = args.batch_size
        cfg.training.per_device_eval_batch_size = args.batch_size
    if args.synthetic_trials is not None:
        cfg.data.synthetic_trials = args.synthetic_trials

    t = cfg.training
    dtype = jnp.bfloat16 if t.bf16 else jnp.float32
    model = build_model(cfg, dtype=dtype)

    train_ds, val_ds = prepare_datasets(cfg, process_shard=args.multihost)
    print(f"[data] train windows: {len(train_ds)}, val windows: {len(val_ds)}")
    bs = min(t.per_device_train_batch_size, len(train_ds))
    steps_per_epoch = max(len(train_ds) // bs, 1)

    rng = jax.random.PRNGKey(cfg.system.seed)
    sample = train_ds.batch(list(range(min(2, len(train_ds)))))
    variables = model.init(rng, jnp.asarray(sample["eeg1"]), jnp.asarray(sample["eeg2"]))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"[model] {n_params:,} parameters")

    schedule = cosine_annealing_schedule(t.learning_rate, t.num_train_epochs, steps_per_epoch)
    tx = make_optimizer(schedule, t.weight_decay, grad_clip=t.grad_clip)
    state = create_train_state(model, variables, tx)

    lam = dict(sym=t.lambda_sym, ibs=t.lambda_ibs, ibs_cls=t.lambda_ibs_cls,
               contrastive=t.lambda_ibs_contrastive)
    use = dict(sym=t.use_sym_loss, ibs=t.use_ibs_loss, ibs_cls=t.use_ibs_cls_loss,
               contrastive=t.use_ibs_contrastive)
    has_ibs = cfg.ablation.use_ibs

    def maybe_preprocess(x):
        """Optional on-device CAR + bandpass + z-score
        (data.enable_preprocessing, dual_eeg_dataset.py SimpleEEGPreprocessor
        role — fused into the same XLA program as the model)."""
        if not cfg.data.enable_preprocessing:
            return x
        from eyegaze_tpu.ops.preprocess import common_average_reference, zscore
        from eyegaze_tpu.ops.spectral import bandpass_fft

        x = bandpass_fft(x, cfg.data.filter_low, cfg.data.filter_high,
                         cfg.data.sampling_rate)
        x = common_average_reference(x)
        return zscore(x)

    def loss_fn(params, batch, rng_key, step):
        out = model.apply(
            {"params": params},
            maybe_preprocess(jnp.asarray(batch["eeg1"])),
            maybe_preprocess(jnp.asarray(batch["eeg2"])),
            deterministic=False, rngs={"dropout": rng_key},
        )
        labels = jnp.asarray(batch["label"])
        loss = cross_entropy(out["logits"], labels)
        aux = {"logits": out["logits"], "loss_ce": loss}
        if use["sym"]:
            l = symmetry_loss(out["cls1"], out["cls2"])
            loss = loss + lam["sym"] * l
            aux["loss_sym"] = l
        if has_ibs and use["ibs"]:
            l = ibs_alignment_loss(out["ibs_token"], out["cls1"], out["cls2"])
            loss = loss + lam["ibs"] * l
            aux["loss_ibs_align"] = l
        if has_ibs and use["ibs_cls"]:
            l = cross_entropy(out["ibs_logits"], labels)
            loss = loss + lam["ibs_cls"] * l
            aux["loss_ibs_cls"] = l
        if has_ibs and use["contrastive"]:
            l = ibs_contrastive_loss(out["ibs_token"], labels)
            loss = loss + lam["contrastive"] * l
            aux["loss_contrastive"] = l
        return loss, aux

    def eval_logits_fn(params, batch):
        out = model.apply(
            {"params": params},
            maybe_preprocess(jnp.asarray(batch["eeg1"])),
            maybe_preprocess(jnp.asarray(batch["eeg2"])),
        )
        return out["logits"]

    logger = RunLogger(t.output_dir, cfg.wandb.run_name, use_wandb=cfg.wandb.enabled)
    metric_map = {"f1": "f1_macro", "accuracy": "accuracy"}
    trainer = Trainer(
        state, loss_fn, eval_logits_fn,
        TrainerConfig(
            num_epochs=t.num_train_epochs,
            save_every_epochs=t.save_every_n_epochs,
            metric_for_best=metric_map.get(t.metric_for_best_model, t.metric_for_best_model),
            greater_is_better=t.greater_is_better,
            checkpoint_dir=str(Path(t.output_dir) / "checkpoints"),
            seed=cfg.system.seed,
            use_mesh=cfg.system.mesh,
            watch_every_epochs=args.watch,
        ),
        num_classes=cfg.model.num_labels,
        logger=logger.log,
        watch_logger=logger.log_watch if args.watch else None,
    )
    if args.resume:
        latest = trainer.ckpt.latest_epoch()
        if latest is not None:
            trainer.state = trainer.ckpt.restore(f"checkpoint_epoch_{latest}", trainer.state)
            print(f"[resume] restored epoch {latest}")

    eval_bs = min(t.per_device_eval_batch_size, max(len(val_ds), 1))
    result = trainer.fit(
        train_batches_fn=lambda epoch: train_ds.iter_batches(
            bs, shuffle=True, seed=cfg.system.seed, drop_remainder=True, epoch=epoch),
        eval_batches_fn=lambda: val_ds.iter_batches(eval_bs),
        config_dict=cfg.to_dict(),
    )
    print(f"[done] best {t.metric_for_best_model}: {result['best_metric']}")
    return result


if __name__ == "__main__":
    main()
