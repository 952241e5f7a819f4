#!/usr/bin/env python
"""Train the multimodal fuzzy-gating fusion model (gaze + EEG).

TPU-native rebuild of ``4_Experiments/scripts/train_multimodal_fuzzy_fusion.py``:
composed MultimodalFusionModel, two learning rates (encoders 1e-5 / fusion
1e-4 via optax.multi_transform param groups), optional encoder freezing
(zero-update groups), loss = CE(fused) + 0.3*CE(img/T) + 0.3*CE(eeg/T) +
0.1*temp_reg (:440-460), alpha/temperature logging, partial pretrained-encoder
loading from orbax checkpoints.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.config import load_yaml_config
from eyegaze_tpu.data.image_fusion import imagenet_normalize, to_unit_float
from eyegaze_tpu.data.loader import MultimodalArrays
from eyegaze_tpu.data.synthetic import (
    synthetic_eeg_pair_dataset,
    synthetic_gaze_pair_dataset,
)
from eyegaze_tpu.models.multimodal import MultimodalFusionModel
from eyegaze_tpu.train.losses import cross_entropy
from eyegaze_tpu.train.optim import make_optimizer
from eyegaze_tpu.train.state import create_train_state
from eyegaze_tpu.train.trainer import Trainer, TrainerConfig
from eyegaze_tpu.utils.logging import RunLogger


def load_pretrained_encoder(params: dict, ckpt_dir: str, name: str, scope: str) -> dict:
    """Partial state loading: intersect the checkpointed params with the
    encoder's subtree (train_multimodal_fuzzy_fusion.py:287-317 semantics)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore((Path(ckpt_dir) / name).resolve())
    src = restored["params"]
    import flax

    flat_dst = flax.traverse_util.flatten_dict(params[scope])
    flat_src = flax.traverse_util.flatten_dict(src)
    matched = 0
    for k in list(flat_dst):
        if k in flat_src and flat_src[k].shape == flat_dst[k].shape:
            flat_dst[k] = flat_src[k]
            matched += 1
    params[scope] = flax.traverse_util.unflatten_dict(flat_dst)
    print(f"[pretrained] {scope}: matched {matched}/{len(flat_dst)} params")
    return params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--watch", type=int, default=0, metavar="N",
                    help="log param/grad histograms every N epochs "
                         "(wandb.watch role, train_gaze_earlyfusion.py:458)")
    ap.add_argument("--gaze-checkpoint", default=None)
    ap.add_argument("--eeg-checkpoint", default=None)
    ap.add_argument("--images", default=None,
                    help="converted gaze-array dir (scripts/convert_gaze_images.py)")
    ap.add_argument("--eeg", default=None,
                    help="converted EEG trial dir (scripts/preprocess_eeg_raw.py)")
    ap.add_argument("--mesh", nargs="?", const="dp", default=None,
                    help="device-mesh spec (system.mesh): 'dp' = data-parallel "
                         "over all local devices; 'dpN,tpM' / 'tpM' adds a "
                         "tensor-parallel model axis (Megatron-style weight "
                         "sharding, parallel/sharding.py)")
    args = ap.parse_args(argv)
    if bool(args.images) != bool(args.eeg):
        ap.error("--images and --eeg must be given together")

    cfg = load_yaml_config(args.config)
    if args.mesh:  # explicit CLI spec overrides the YAML (train_dual_eeg.py)
        cfg.system.mesh = args.mesh
    if args.epochs is not None:
        cfg.training.num_train_epochs = args.epochs
    t = cfg.training
    dtype = jnp.bfloat16 if t.bf16 else jnp.float32

    if args.tiny:
        cfg.model.img_size = 64
        model = MultimodalFusionModel(
            img_size=64, vit_embed_dim=64, vit_depth=1, vit_num_heads=4,
            eeg_in_channels=cfg.model.in_channels, eeg_d_model=64,
            eeg_num_layers=1, eeg_num_heads=4, eeg_d_ff=128, eeg_max_len=512,
            gaze_fusion_mode=cfg.model.fusion_mode, fuzzy_mode=cfg.model.fuzzy_mode,
            use_spectrogram=cfg.ablation.use_spectrogram, dropout=t.dropout, dtype=dtype,
        )
    else:
        model = MultimodalFusionModel(
            img_size=cfg.model.img_size,
            eeg_in_channels=cfg.model.in_channels, eeg_d_model=cfg.model.d_model,
            eeg_num_layers=cfg.model.num_layers, eeg_num_heads=cfg.model.num_heads,
            eeg_d_ff=cfg.model.d_ff, eeg_max_len=max(cfg.data.window_size // 4, 256),
            sampling_rate=cfg.data.sampling_rate,
            gaze_fusion_mode=cfg.model.fusion_mode, fuzzy_mode=cfg.model.fuzzy_mode,
            use_spectrogram=cfg.ablation.use_spectrogram,
            use_cross_attention=cfg.ablation.use_cross_attention,
            dropout=t.dropout, dtype=dtype,
        )

    d = cfg.data
    if args.images:
        # Real converted data: EEG split dirs carry metadata_indices aligning
        # each kept trial back to the gaze conversion's metadata order
        # (MultimodalDataset role, multimodal_dataset.py:19-275).
        import json as _json

        from eyegaze_tpu.data.images import load_converted_gaze

        def build(split):
            eeg_dir = Path(args.eeg)
            meta = _json.loads((eeg_dir / f"{split}_metadata.json").read_text())
            idx = np.asarray(meta["metadata_indices"], np.int64)
            ga = load_converted_gaze(args.images, indices=idx)
            return MultimodalArrays(
                img1=ga.img1, img2=ga.img2,
                eeg1=np.load(eeg_dir / f"{split}_eeg1.npy"),
                eeg2=np.load(eeg_dir / f"{split}_eeg2.npy"),
                labels=np.load(eeg_dir / f"{split}_labels.npy"),
                pairs=np.load(eeg_dir / f"{split}_pairs.npy"),
                window_size=d.window_size, stride=d.stride,
            )

        train_ds, val_ds = build("train"), build("val")
    else:
        n = d.synthetic_trials
        gaze = synthetic_gaze_pair_dataset(n=n, H=cfg.model.img_size,
                                           W=cfg.model.img_size, seed=d.random_seed)
        eeg = synthetic_eeg_pair_dataset(n=n, C=cfg.model.in_channels, T=d.window_size,
                                         fs=d.sampling_rate, seed=d.random_seed)
        n_val = max(n // 5, 1)

        def build(sl):
            return MultimodalArrays(
                img1=gaze["img1"][sl], img2=gaze["img2"][sl],
                eeg1=eeg["eeg1"][sl], eeg2=eeg["eeg2"][sl],
                labels=eeg["label"][sl],
                window_size=d.window_size, stride=d.window_size,
            )

        train_ds, val_ds = build(slice(None, -n_val)), build(slice(-n_val, None))
    print(f"[data] train: {len(train_ds)} windows, val: {len(val_ds)} windows")

    def prep_images(batch):
        """uint8/[0,1] images -> ImageNet-normalized device arrays (on device,
        inside jit)."""
        i1 = imagenet_normalize(to_unit_float(jnp.asarray(batch["img1"])))
        i2 = imagenet_normalize(to_unit_float(jnp.asarray(batch["img2"])))
        return i1, i2

    rng = jax.random.PRNGKey(cfg.system.seed)
    s = train_ds.batch(np.arange(min(2, len(train_ds))))
    s1, s2 = prep_images(s)
    variables = model.init(rng, s1, s2,
                           jnp.asarray(s["eeg1"]), jnp.asarray(s["eeg2"]))
    params = dict(variables["params"])
    if args.gaze_checkpoint:
        params = load_pretrained_encoder(params, args.gaze_checkpoint, "best_model",
                                         "gaze_encoder")
    if args.eeg_checkpoint:
        params = load_pretrained_encoder(params, args.eeg_checkpoint, "best_model",
                                         "eeg_encoder")
    variables = {"params": params}

    # Two-LR param groups: encoders vs fusion (py:722-736); freezing = zero group.
    # `is not None`, not truthiness: an explicit 0.0 means "freeze via zero
    # LR" and must not silently fall back to learning_rate * 0.1.
    encoder_lr = (t.encoder_learning_rate
                  if t.encoder_learning_rate is not None
                  else t.learning_rate * 0.1)

    def group_of(path, _v):
        top = path[0]
        return "encoder" if top in ("gaze_encoder", "eeg_encoder") else "fusion"

    tx = make_optimizer(
        t.learning_rate, t.weight_decay, grad_clip=t.grad_clip,
        param_groups=group_of,
        group_lrs={"encoder": encoder_lr, "fusion": t.learning_rate},
        frozen_groups=("encoder",) if t.freeze_encoders else (),
    )
    state = create_train_state(model, variables, tx)

    def loss_fn(params, batch, rng_key, step):
        i1, i2 = prep_images(batch)
        out = model.apply(
            {"params": params}, i1, i2,
            jnp.asarray(batch["eeg1"]), jnp.asarray(batch["eeg2"]),
            deterministic=False, rngs={"dropout": rng_key},
        )
        labels = jnp.asarray(batch["label"])
        loss_fused = cross_entropy(out["logits"], labels)
        # Aux CE on TEMPERATURE-CALIBRATED logits
        # (train_multimodal_fuzzy_fusion.py:444-448: logits / T with T
        # detached — aux_info carries stop_gradient'ed temperatures, so no
        # gradient reaches T through these terms, exactly like the
        # reference's .detach()).  Round-5 fix: the round-4 loss used the
        # raw logits, a recipe deviation the gaze/EEG equivalence harness
        # pattern caught on review.
        t_img = out["aux_info"]["temperatures"]["img"]
        t_eeg = out["aux_info"]["temperatures"]["eeg"]
        loss_img = cross_entropy(out["img_logits"] / t_img, labels)
        loss_eeg = cross_entropy(out["eeg_logits"] / t_eeg, labels)
        loss = (loss_fused + t.lambda_img * loss_img + t.lambda_eeg * loss_eeg
                + t.lambda_temp_reg * out["temp_reg"])
        return loss, {
            "logits": out["logits"], "loss_fused": loss_fused,
            "loss_img": loss_img, "loss_eeg": loss_eeg,
            "loss_alpha_mean": jnp.mean(out["alpha"]),
        }

    def eval_logits_fn(params, batch):
        i1, i2 = prep_images(batch)
        out = model.apply(
            {"params": params}, i1, i2,
            jnp.asarray(batch["eeg1"]), jnp.asarray(batch["eeg2"]),
        )
        return out["logits"]

    logger = RunLogger(t.output_dir, cfg.wandb.run_name, use_wandb=cfg.wandb.enabled)
    bs = min(t.per_device_train_batch_size, len(train_ds))
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
    if args.resume and trainer.ckpt is not None:
        latest = trainer.ckpt.latest_epoch()
        if latest is not None:
            trainer.state = trainer.ckpt.restore(f"checkpoint_epoch_{latest}", trainer.state)
            print(f"[resume] restored epoch {latest}")
    # Stamp the EXACT composite constructor into the checkpoint meta: tiny
    # runs override encoder dims the YAML cannot reproduce, and head counts
    # are never recoverable from param shapes (serving.py::MultimodalPredictor
    # reconstruction contract — same role as train_gaze.py's model.kind stamp).
    import dataclasses as _dc

    config_dict = cfg.to_dict()
    config_dict["model"]["multimodal"] = {
        f.name: getattr(model, f.name)
        for f in _dc.fields(type(model))
        if f.name not in ("parent", "name", "dtype")
    }
    result = trainer.fit(
        train_batches_fn=lambda epoch: train_ds.iter_batches(
            bs, shuffle=True, seed=cfg.system.seed,
            drop_remainder=True, epoch=epoch),
        eval_batches_fn=lambda: val_ds.iter_batches(min(bs, len(val_ds))),
        config_dict=config_dict,
    )
    print(f"[done] best f1_macro: {result['best_metric']}")
    return result


if __name__ == "__main__":
    main()
