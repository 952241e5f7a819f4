#!/usr/bin/env python
"""Train the HyperEEG Encoder with its 6 documented ablations.

Rebuild of the MISSING reference trainer ``train_eeg_hypereeg.py`` from its
spec (4_Experiments/experiments_list.md:194-345): --ablation
full|baseline|no_sinc|no_graph|no_cross|no_uncertainty; AdamW lr 5e-4,
weight decay 0.01, 10-epoch linear warmup + cosine, grad clip 1.0, bf16
(the fp16 equivalent), training-only augmentations (time masking, channel
dropout, Gaussian noise), pair-held-out split (val pairs 33-40).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.data.augment import augment_eeg
from eyegaze_tpu.data.loader import DualEEGWindowDataset
from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset
from eyegaze_tpu.models.hypereeg import (ABLATIONS, PRESETS,
                                         create_hypereeg_model)
from eyegaze_tpu.train.losses import cross_entropy
from eyegaze_tpu.train.optim import make_optimizer, warmup_cosine_schedule
from eyegaze_tpu.train.state import create_train_state
from eyegaze_tpu.train.trainer import Trainer, TrainerConfig
from eyegaze_tpu.utils.logging import RunLogger


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablation", choices=list(ABLATIONS), default="full")
    ap.add_argument("--preset", choices=list(PRESETS), default="documented",
                    help="width preset: 'documented' (embed 128, the "
                         "reference's explicit hyperparameter list — "
                         "default) or '680k' (embed swept to land in the "
                         "statistics table's '~680K Total Parameters' "
                         "budget; see models/hypereeg.py PRESETS)")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--warmup-epochs", type=int, default=10)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--fs", type=float, default=250.0)
    ap.add_argument("--trials", type=int, default=48)
    ap.add_argument("--augment", action="store_true", default=True)
    ap.add_argument("--no-augment", dest="augment", action="store_false")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--watch", type=int, default=0, metavar="N",
                    help="log param/grad histograms every N epochs "
                         "(wandb.watch role, train_gaze_earlyfusion.py:458)")
    ap.add_argument("--mesh", nargs="?", const="dp", default=None,
                    help="device-mesh spec (system.mesh): 'dp' = data-parallel "
                         "over all local devices; 'dpN,tpM' / 'tpM' adds a "
                         "tensor-parallel model axis (Megatron-style weight "
                         "sharding, parallel/sharding.py)")
    args = ap.parse_args(argv)

    out_dir = args.output_dir or f"runs/eeg_hypereeg/{args.ablation}"
    if args.tiny:
        model = create_hypereeg_model(args.ablation, in_channels=args.channels,
                                      embed_dim=32, num_heads=4, sinc_kernel_size=33,
                                      sample_rate=args.fs)
    else:
        model = create_hypereeg_model(args.ablation, preset=args.preset,
                                      in_channels=args.channels,
                                      sample_rate=args.fs)

    data = synthetic_eeg_pair_dataset(n=args.trials, C=args.channels,
                                      T=max(args.window, 1024), fs=args.fs, seed=42)
    val_mask = np.isin(data["pair"], np.arange(33, 41))
    def subset(mask):
        return DualEEGWindowDataset(
            data["eeg1"][mask], data["eeg2"][mask], data["label"][mask],
            window_size=args.window, stride=args.stride, pairs=data["pair"][mask])
    train_ds, val_ds = subset(~val_mask), subset(val_mask)
    print(f"[data] train windows: {len(train_ds)}, val windows: {len(val_ds)}")

    rng = jax.random.PRNGKey(42)
    s = train_ds.batch([0])
    variables = model.init(rng, jnp.asarray(s["eeg1"]), jnp.asarray(s["eeg2"]))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"[model] HyperEEG[{args.ablation}]: {n_params:,} params")

    bs = min(args.batch_size, len(train_ds))
    steps_per_epoch = max(len(train_ds) // bs, 1)
    schedule = warmup_cosine_schedule(args.lr, args.warmup_epochs * steps_per_epoch,
                                      args.epochs * steps_per_epoch)
    tx = make_optimizer(schedule, 0.01, grad_clip=1.0)
    state = create_train_state(model, variables, tx)

    def loss_fn(params, batch, rng_key, step):
        e1 = jnp.asarray(batch["eeg1"])
        e2 = jnp.asarray(batch["eeg2"])
        if args.augment:
            k1, k2, k3 = jax.random.split(rng_key, 3)
            e1 = augment_eeg(k1, e1)
            e2 = augment_eeg(k2, e2)
            rng_key = k3
        out = model.apply({"params": params}, e1, e2, deterministic=False,
                          rngs={"dropout": rng_key})
        loss = cross_entropy(out["logits"], jnp.asarray(batch["label"]))
        return loss, {"logits": out["logits"], "loss_ce": loss}

    def eval_logits_fn(params, batch):
        out = model.apply({"params": params}, jnp.asarray(batch["eeg1"]),
                          jnp.asarray(batch["eeg2"]))
        return out["logits"]

    logger = RunLogger(out_dir, f"hypereeg_{args.ablation}")
    trainer = Trainer(
        state, loss_fn, eval_logits_fn,
        TrainerConfig(num_epochs=args.epochs, metric_for_best="f1_macro",
                      checkpoint_dir=str(Path(out_dir) / "checkpoints"), seed=42,
                      use_mesh=args.mesh,
                      watch_every_epochs=args.watch),
        logger=logger.log,
        watch_logger=logger.log_watch if args.watch else None,
    )
    eval_bs = min(bs, max(len(val_ds), 1))
    result = trainer.fit(
        train_batches_fn=lambda epoch: train_ds.iter_batches(
            bs, shuffle=True, seed=42, drop_remainder=True, epoch=epoch),
        eval_batches_fn=(lambda: val_ds.iter_batches(eval_bs)) if len(val_ds) else None,
        config_dict={
            "ablation": args.ablation,
            # Full constructor kwargs so HyperEEGPredictor.from_checkpoint
            # rebuilds the exact model (same contract as train_multimodal).
            "model": {"hypereeg": {
                f: getattr(model, f)
                for f in ("in_channels", "num_classes", "embed_dim",
                          "num_heads", "sample_rate", "sinc_kernel_size",
                          "use_sinc", "use_graph", "use_cross_attn",
                          "use_uncertainty")}},
        },
    )
    print(f"[done] best f1_macro: {result['best_metric']}")
    return result


if __name__ == "__main__":
    main()
