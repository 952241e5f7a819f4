#!/usr/bin/env python
"""Train the Artifact Removal Transformer (EEG denoising seq2seq).

TPU-native rebuild of the ART training path: synthetic (or real-layout) noisy
-> clean EEG pairs from the data factory (1_Data/processed/two_EEG_fusion.py
semantics via eyegaze_tpu.data.synthetic.gen_eeg), teacher-forced
encoder-decoder (tgt = labels), MSE or z-scored-MSE loss
(art.py:625-657), AdamW + cosine schedule, orbax checkpoints.

Usage:
    python scripts/train_art.py --epochs 5 --trials 64 [--loss-zscore] [--tiny]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.data.loader import ArrayDataset, batch_iterator
from eyegaze_tpu.data.synthetic import gen_eeg
from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer, art_loss
from eyegaze_tpu.train.optim import cosine_annealing_schedule, make_optimizer
from eyegaze_tpu.train.state import create_train_state
from eyegaze_tpu.train.trainer import Trainer, TrainerConfig
from eyegaze_tpu.utils.logging import RunLogger


def build_dataset(n: int, C: int, T: int, seed: int = 42) -> ArrayDataset:
    """Noisy->clean pairs: clean = multi-sine EEG, input = clean + artifacts.

    Mirrors the synthetic generator pairing of two_EEG_fusion.py:51-66 (attr =
    noisy input, target = clean labels), with the artifact as added noise so
    the denoising task is learnable.
    """
    rng = np.random.default_rng(seed)
    clean = np.stack([gen_eeg(C, T, mode="sine", seed=seed * 100019 + i) for i in range(n)])
    noise = np.stack(
        [gen_eeg(C, T, mode="noise", noise_std=0.5, seed=seed * 100003 + i) for i in range(n)]
    )
    return ArrayDataset({"input_values": clean + noise, "labels": clean})


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--trials", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--length", type=int, default=1024)
    ap.add_argument("--loss-zscore", action="store_true")
    ap.add_argument("--attn-dropout", type=float, default=None,
                    help="attention-weight dropout (default: follows the "
                         "model dropout, the reference behavior). 0.0 "
                         "disables only the softmax-weight dropout — a "
                         "documented recipe deviation, docs/PARITY.md")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--output-dir", default="runs/art")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--watch", type=int, default=0, metavar="N",
                    help="log param/grad histograms every N epochs "
                         "(wandb.watch role, train_gaze_earlyfusion.py:458)")
    ap.add_argument("--mesh", nargs="?", const="dp", default=None,
                    help="device-mesh spec (system.mesh): 'dp' = data-parallel "
                         "over all local devices; 'dpN,tpM' / 'tpM' adds a "
                         "tensor-parallel model axis (Megatron-style weight "
                         "sharding, parallel/sharding.py)")
    args = ap.parse_args(argv)

    if args.tiny:
        cfg = ArtConfig(in_channels=args.channels, out_channels=args.channels,
                        embedding_size=32, num_encoder_layers=1, num_decoder_layers=1,
                        num_heads=4, feedforward_size=64, max_len=args.length,
                        attn_dropout=args.attn_dropout)
    else:
        cfg = ArtConfig(in_channels=args.channels, out_channels=args.channels,
                        max_len=max(args.length, 2048), loss_zscore=args.loss_zscore,
                        attn_dropout=args.attn_dropout)
    model = ArtifactRemovalTransformer(cfg)

    ds = build_dataset(args.trials, args.channels, args.length)
    n_val = max(args.trials // 5, 1)
    train_ds = ArrayDataset({k: v[:-n_val] for k, v in ds.arrays.items()})
    val_ds = ArrayDataset({k: v[-n_val:] for k, v in ds.arrays.items()})

    rng = jax.random.PRNGKey(42)
    s = train_ds[np.arange(1)]
    variables = model.init(rng, jnp.asarray(s["input_values"]), jnp.asarray(s["labels"]))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"[model] ART: {n_params:,} params")

    bs = min(args.batch_size, len(train_ds))
    steps_per_epoch = max(len(train_ds) // bs, 1)
    schedule = cosine_annealing_schedule(args.lr, args.epochs, steps_per_epoch)
    tx = make_optimizer(schedule, 0.01, grad_clip=1.0)
    state = create_train_state(model, variables, tx)

    def loss_fn(params, batch, rng_key, step):
        recon = model.apply(
            {"params": params},
            jnp.asarray(batch["input_values"]), jnp.asarray(batch["labels"]),
            deterministic=False, rngs={"dropout": rng_key},
        )
        loss = art_loss(recon, jnp.asarray(batch["labels"]),
                        loss_zscore=args.loss_zscore)
        return loss, {}

    def eval_metrics_fn(params, batch):
        x = jnp.asarray(batch["input_values"])
        y = jnp.asarray(batch["labels"])
        recon = model.apply({"params": params}, x, y)
        loss = art_loss(recon, y, loss_zscore=args.loss_zscore)

        # Denoising quality: SNR of input vs reconstruction against clean.
        def snr_db(est):
            sig = jnp.sum(y**2)
            err = jnp.sum((est - y) ** 2) + 1e-12
            return 10.0 * jnp.log10(sig / err)

        snr_in, snr_out = snr_db(x), snr_db(recon)
        return {"loss": loss, "snr_in_db": snr_in, "snr_out_db": snr_out,
                "snr_improvement_db": snr_out - snr_in}

    logger = RunLogger(args.output_dir, "art")
    trainer = Trainer(
        state, loss_fn, None,
        TrainerConfig(
            num_epochs=args.epochs,
            metric_for_best="loss", greater_is_better=False,
            checkpoint_dir=str(Path(args.output_dir) / "checkpoints"),
            seed=7,
            use_mesh=args.mesh,
            watch_every_epochs=args.watch,
        ),
        logger=logger.log,
        eval_metrics_fn=eval_metrics_fn,
        watch_logger=logger.log_watch if args.watch else None,
    )
    result = trainer.fit(
        train_batches_fn=lambda epoch: batch_iterator(
            train_ds, bs, shuffle=True, seed=42, drop_remainder=True,
            epoch=epoch),
        eval_batches_fn=lambda: batch_iterator(val_ds, min(bs, len(val_ds))),
        # ArtConfig into the checkpoint meta so serving.ArtDenoiser can
        # reconstruct the exact architecture (the analyze_eeg.py:118-129 role).
        config_dict={"model": dataclasses.asdict(cfg)},
    )
    print(f"[done] best val loss: {result['best_metric']}")
    return result["best_metric"]


if __name__ == "__main__":
    main()
