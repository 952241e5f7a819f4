#!/usr/bin/env python
"""Train Early/Late-fusion ViT on gaze-heatmap pairs.

TPU-native rebuild of ``4_Experiments/scripts/train_gaze_earlyfusion.py`` and
``train_gaze_latefusion.py`` (one script, ``--model early|late``): pair-ID
held-out split (val pairs 33-40), inverse-frequency weighted CE, per-step
linear-warmup + cosine LR, bf16 compute (the AMP equivalent), best-by-F1 +
periodic checkpoints, resume.

Usage:
    python scripts/train_gaze.py --config configs/gaze_earlyfusion.yaml --model early
    python scripts/train_gaze.py --config configs/gaze_latefusion.yaml --model late
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
from eyegaze_tpu.data.gaze_augment import augment_gaze_pair
from eyegaze_tpu.data.image_fusion import (
    imagenet_normalize,
    to_unit_float,
    vit_processor_normalize,
)
from eyegaze_tpu.data.loader import ArrayDataset, batch_iterator
from eyegaze_tpu.data.metadata import class_weights
from eyegaze_tpu.data.synthetic import synthetic_gaze_pair_dataset
from eyegaze_tpu.models.vit import EarlyFusionViT, LateFusionViT, load_timm_state_dict
from eyegaze_tpu.train.losses import cross_entropy, weighted_cross_entropy
from eyegaze_tpu.train.optim import make_optimizer, warmup_cosine_schedule
from eyegaze_tpu.train.state import create_train_state
from eyegaze_tpu.train.trainer import Trainer, TrainerConfig
from eyegaze_tpu.utils.logging import RunLogger


def build_model(cfg: ExperimentConfig, which: str, dtype):
    kw = dict(
        num_classes=cfg.model.num_labels if hasattr(cfg.model, "num_labels") else 3,
        img_size=cfg.model.img_size,
        fusion_mode=cfg.model.fusion_mode,
        dtype=dtype,
    )
    if which == "early":
        return EarlyFusionViT(dropout=cfg.training.dropout, **kw)
    return LateFusionViT(dropout=cfg.training.dropout, **kw)


def prepare_data(cfg: ExperimentConfig, images_dir=None, image_root=None,
                 metadata_path=None):
    """Images in [0,1] float (synthetic) or uint8 (real, /255 on device);
    augmentation + ImageNet normalization happen on device inside the train
    step (train-only augmentation parity with gaze_pair_dataset.py:182-206).

    Real-data sources (gaze_pair_dataset.py:23-110 role):
    - ``images_dir``: converted arrays from scripts/convert_gaze_images.py;
    - ``image_root`` + ``metadata_path``: decode JPGs directly (small runs).
    """
    d = cfg.data
    if images_dir:
        from eyegaze_tpu.data.images import load_converted_gaze

        ga = load_converted_gaze(images_dir)
        data = {"img1": ga.img1, "img2": ga.img2, "label": ga.labels,
                "pair": ga.pairs}
    elif image_root:
        from eyegaze_tpu.data.images import load_gaze_pairs
        from eyegaze_tpu.data.metadata import load_metadata

        ga = load_gaze_pairs(load_metadata(metadata_path), image_root,
                             size=cfg.model.img_size)
        data = {"img1": ga.img1, "img2": ga.img2, "label": ga.labels,
                "pair": ga.pairs}
    else:
        data = synthetic_gaze_pair_dataset(
            n=d.synthetic_trials, H=cfg.model.img_size, W=cfg.model.img_size,
            seed=d.random_seed,
        )
    # Pair-ID held-out split (gaze_pair_dataset.py:164-171).
    val_mask = np.isin(data["pair"], np.asarray(d.val_pairs))
    def subset(mask):
        return ArrayDataset({"img1": data["img1"][mask], "img2": data["img2"][mask],
                             "label": data["label"][mask]})
    return subset(~val_mask), subset(val_mask)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--model", choices=["early", "late", "datafusion"], default="early")
    ap.add_argument("--data-fusion-mode", default="horizontal",
                    choices=["horizontal", "vertical", "add", "multiply", "subtract"],
                    help="data-level fusion op for --model datafusion "
                         "(two_image_fusion.py DualImageDataset role)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--tiny", action="store_true", help="shrink ViT for smoke runs")
    ap.add_argument("--images", default=None,
                    help="converted gaze-array dir (scripts/convert_gaze_images.py)")
    ap.add_argument("--image-root", default=None,
                    help="raw JPG directory (decoded directly; small runs)")
    ap.add_argument("--metadata", default=None,
                    help="complete_metadata.json (required with --image-root)")
    ap.add_argument("--pretrained", default=None,
                    help=".npz ViT weights (scripts/export_timm_weights.py); "
                         "overrides the config's pretrained_path")
    ap.add_argument("--watch", type=int, default=0, metavar="N",
                    help="log param/grad histograms every N epochs "
                         "(wandb.watch role, train_gaze_earlyfusion.py:458)")
    ap.add_argument("--image-norm", choices=["imagenet", "vit"],
                    default="imagenet",
                    help="datafusion-path normalization: 'imagenet' (default; "
                         "matches the ported timm ViT weights) or 'vit' "
                         "(HF ViTImageProcessor 0.5/0.5 -> [-1,1], the "
                         "reference DualImageDataset contract, "
                         "two_image_fusion.py:64-150 — see docs/PARITY.md)")
    ap.add_argument("--mesh", nargs="?", const="dp", default=None,
                    help="device-mesh spec (system.mesh): 'dp' = data-parallel "
                         "over all local devices; 'dpN,tpM' / 'tpM' adds a "
                         "tensor-parallel model axis (Megatron-style weight "
                         "sharding, parallel/sharding.py)")
    args = ap.parse_args(argv)
    if args.image_root and not args.metadata:
        ap.error("--image-root requires --metadata")

    cfg = load_yaml_config(args.config)
    if args.mesh:  # explicit CLI spec overrides the YAML (train_dual_eeg.py)
        cfg.system.mesh = args.mesh
    if args.epochs is not None:
        cfg.training.num_train_epochs = args.epochs
    if args.batch_size is not None:
        cfg.training.per_device_train_batch_size = args.batch_size
    t = cfg.training
    dtype = jnp.bfloat16 if t.bf16 else jnp.float32

    if args.tiny:
        cfg.model.img_size = 64
        model_kwargs = dict(embed_dim=64, depth=2, num_heads=4)
    else:
        model_kwargs = {}
    if args.model == "early":
        model = EarlyFusionViT(
            num_classes=3, img_size=cfg.model.img_size,
            fusion_mode=cfg.model.fusion_mode, dropout=t.dropout, dtype=dtype,
            **model_kwargs,
        )
    elif args.model == "datafusion":
        # Data-level fusion: fuse in image space (paste ops resized back),
        # then a plain 3-channel ViT — the DualImageDataset training path
        # (1_Data/processed/two_image_fusion.py:19-161).
        from eyegaze_tpu.models.vit import VisionTransformer

        model = VisionTransformer(
            num_classes=3, img_size=cfg.model.img_size, dropout=t.dropout,
            dtype=dtype, **model_kwargs,
        )
    else:
        model = LateFusionViT(
            num_classes=3, img_size=cfg.model.img_size,
            fusion_mode=cfg.model.fusion_mode, dropout=t.dropout, dtype=dtype,
            **model_kwargs,
        )

    train_ds, val_ds = prepare_data(cfg, images_dir=args.images,
                                    image_root=args.image_root,
                                    metadata_path=args.metadata)
    print(f"[data] train: {len(train_ds)}, val: {len(val_ds)}")
    bs = min(t.per_device_train_batch_size, len(train_ds))
    steps_per_epoch = max(len(train_ds) // bs, 1)

    if args.model == "datafusion":
        from eyegaze_tpu.data.image_fusion import fuse_image_pair, resize_bilinear

        size = cfg.model.img_size

        def fuse(i1, i2):
            fused = fuse_image_pair(i1, i2, args.data_fusion_mode)
            if fused.shape[-2:] != (size, size):
                fused = resize_bilinear(fused, size, size)
            return fused
    else:
        fuse = None
    norm_fused = (imagenet_normalize if args.image_norm == "imagenet"
                  else vit_processor_normalize)

    rng = jax.random.PRNGKey(cfg.system.seed)
    sample = train_ds[np.arange(min(2, len(train_ds)))]
    s1 = to_unit_float(jnp.asarray(sample["img1"]))
    s2 = to_unit_float(jnp.asarray(sample["img2"]))
    if fuse is not None:
        variables = model.init(rng, norm_fused(fuse(s1, s2)))
    else:
        variables = model.init(rng, s1, s2)

    if args.pretrained:
        cfg.model.pretrained = True
        cfg.model.pretrained_path = args.pretrained
    if cfg.model.pretrained and cfg.model.pretrained_path:
        state_np = dict(np.load(cfg.model.pretrained_path))
        key = {"early": "backbone", "late": "encoder", "datafusion": ""}[args.model]
        variables = {"params": load_timm_state_dict(dict(variables["params"]), state_np,
                                                    backbone_key=key)}
        print(f"[model] loaded pretrained weights from {cfg.model.pretrained_path}")

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"[model] {args.model}-fusion ViT ({cfg.model.fusion_mode}): {n_params:,} params")

    total_steps = steps_per_epoch * t.num_train_epochs
    warmup_steps = int(steps_per_epoch * max(t.warmup_epochs, 0))
    schedule = warmup_cosine_schedule(t.learning_rate, warmup_steps, total_steps)
    tx = make_optimizer(schedule, t.weight_decay, grad_clip=t.grad_clip)
    state = create_train_state(model, variables, tx)

    w = (jnp.asarray(class_weights(train_ds.arrays["label"].tolist()))
         if t.use_class_weights else None)

    def _forward(params, img1, img2, deterministic, rngs=None):
        if fuse is not None:
            return model.apply({"params": params},
                               norm_fused(fuse(img1, img2)),
                               deterministic=deterministic, rngs=rngs)
        return model.apply({"params": params}, imagenet_normalize(img1),
                           imagenet_normalize(img2),
                           deterministic=deterministic, rngs=rngs)

    def loss_fn(params, batch, rng_key, step):
        img1 = to_unit_float(jnp.asarray(batch["img1"]))
        img2 = to_unit_float(jnp.asarray(batch["img2"]))
        k_aug, k_drop = jax.random.split(rng_key)
        # Identical-seed augmentation of both streams, train only.
        img1, img2 = augment_gaze_pair(k_aug, img1, img2)
        logits = _forward(params, img1, img2, deterministic=False,
                          rngs={"dropout": k_drop})
        labels = jnp.asarray(batch["label"])
        if w is not None:
            loss = weighted_cross_entropy(logits, labels, w)
        else:
            loss = cross_entropy(logits, labels)
        return loss, {"logits": logits, "loss_ce": loss}

    def eval_logits_fn(params, batch):
        return _forward(params, to_unit_float(jnp.asarray(batch["img1"])),
                        to_unit_float(jnp.asarray(batch["img2"])),
                        deterministic=True)

    logger = RunLogger(t.output_dir, cfg.wandb.run_name, use_wandb=cfg.wandb.enabled)
    trainer = Trainer(
        state, loss_fn, eval_logits_fn,
        TrainerConfig(
            num_epochs=t.num_train_epochs,
            save_every_epochs=t.save_every_n_epochs,
            metric_for_best="f1_macro",
            checkpoint_dir=str(Path(t.output_dir) / "checkpoints"),
            seed=cfg.system.seed,
            use_mesh=cfg.system.mesh,
            watch_every_epochs=args.watch,
        ),
        logger=logger.log,
        watch_logger=logger.log_watch if args.watch else None,
    )
    if args.resume:
        latest = trainer.ckpt.latest_epoch()
        if latest is not None:
            trainer.state = trainer.ckpt.restore(f"checkpoint_epoch_{latest}", trainer.state)
            print(f"[resume] restored epoch {latest}")

    eval_bs = min(t.per_device_eval_batch_size, max(len(val_ds), 1))
    # Record the fusion KIND (early/late/datafusion) in the checkpoint meta so
    # serving/analysis can reconstruct the exact model (analyze_eeg.py:118-129
    # contract; the reference embeds its whole training config the same way).
    config_dict = cfg.to_dict()
    config_dict["model"]["kind"] = args.model
    # Head count is not recoverable from param shapes at restore time; stamp
    # it (plus the datafusion preprocessing contract) so serving replays the
    # exact training-time model (eyegaze_tpu/serving.py::GazePredictor).
    config_dict["model"]["vit_num_heads"] = int(model.num_heads)
    if args.model == "datafusion":
        config_dict["model"]["data_fusion_mode"] = args.data_fusion_mode
        config_dict["model"]["image_norm"] = args.image_norm
    result = trainer.fit(
        train_batches_fn=lambda epoch: batch_iterator(
            train_ds, bs, shuffle=True, seed=cfg.system.seed,
            drop_remainder=True, epoch=epoch),
        eval_batches_fn=lambda: batch_iterator(val_ds, eval_bs),
        config_dict=config_dict,
    )
    print(f"[done] best f1_macro: {result['best_metric']}")
    return result


if __name__ == "__main__":
    main()
