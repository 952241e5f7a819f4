"""Cross-framework training-recipe equivalence: torch reference vs TPU trainer.

VERDICT r3 item #3 — the last untested link in "matching at matched
classification metrics": forward parity is proven (tests/test_torch_port.py
ports reference state_dicts and matches full-model forwards), and the TPU
recipe learns (rehearsal val F1=1.0), but nothing trained BOTH frameworks on
identical data and compared trajectories.  This script does, with every
uncontrolled degree of freedom pinned:

- **identical initial weights**: the reference torch DualEEGTransformer
  (/root/reference/3_Models/backbones/dual_eeg_transformer.py) is seeded,
  and its state_dict is ported to the Flax model via
  ``port_dual_eeg_state_dict`` (the round-trip-tested migration path);
- **byte-identical data, split, and batch order**: one seeded
  ``synthetic_eeg_pair_dataset`` + one precomputed per-epoch permutation
  list drive both loops;
- **identical recipe**: the reference training objective at its
  train_art.py defaults (CE + 0.5*IBS-cls CE + 0.3*IBS supervised
  contrastive; use_sym/use_ibs off —
  /root/reference/4_Experiments/scripts/train_art.py:142-255), AdamW at the
  same lr/wd/betas/eps, per-epoch CosineAnnealingLR (T_max=epochs,
  eta_min=0, stepped after each epoch — :401-494), grad-norm clip 1.0
  (:221), weight decay applied to ALL params on both sides (torch AdamW
  semantics; optax.adamw mask=None);
- **dropout = 0.0** in both models, so no RNG stream enters either loop.

Remaining divergence is framework numerics only (op ordering, matmul
accumulation), so the val macro-F1 trajectories must track each other — the
band is pinned by tests/test_train_equivalence.py against this script's
committed artifact (measurements/train_equivalence_r4.json).

Usage: python scripts/train_equivalence.py [--epochs 8] [--n 72] ...
Stdout is ONE JSON document; progress goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_BACKBONES = Path("/root/reference/3_Models/backbones")

# Tiny flagship geometry (full ablation flags ON), CPU-trainable in minutes;
# matches the forward-parity test geometry (tests/test_torch_port.py).
GEOM = dict(in_channels=8, num_classes=3, d_model=32, num_layers=2,
            num_heads=4, d_ff=64, max_len=128, conv_kernel_size=7,
            conv_stride=4, conv_layers=2)


def make_splits(n, t, seed, noise_std, val_frac=1 / 3):
    from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset

    d = synthetic_eeg_pair_dataset(n=n, C=GEOM["in_channels"], T=t, seed=seed,
                                   noise_std=noise_std)
    n_val = int(n * val_frac)
    tr = {k: d[k][:-n_val] for k in ("eeg1", "eeg2", "label")}
    va = {k: d[k][-n_val:] for k in ("eeg1", "eeg2", "label")}
    return tr, va


def cosine_lr(base_lr, epoch, epochs):
    """torch.optim.lr_scheduler.CosineAnnealingLR value at integer epoch
    (eta_min=0), as produced by per-epoch .step() calls."""
    return base_lr * (1 + math.cos(math.pi * epoch / epochs)) / 2


def macro_f1(labels, preds):
    import jax.numpy as jnp

    from eyegaze_tpu.train.metrics import classification_metrics

    m = classification_metrics(jnp.asarray(labels), jnp.asarray(preds), 3)
    return float(m["f1_macro"])


def build_torch_model(seed):
    import torch

    sys.path.insert(0, str(REF_BACKBONES))
    try:
        import dual_eeg_transformer as ref_dual
    finally:
        sys.path.remove(str(REF_BACKBONES))
    torch.manual_seed(seed)
    return ref_dual.DualEEGTransformer(
        dropout=0.0, sampling_rate=256,
        use_spectrogram=True, use_ibs=True, use_robust_ibs=True,
        use_cross_attention=True, **GEOM,
    )


def train_torch(model, tr, va, epochs, batch, lr, wd, perms, log):
    import torch

    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=wd)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
    e1 = torch.from_numpy(tr["eeg1"])
    e2 = torch.from_numpy(tr["eeg2"])
    y = torch.from_numpy(tr["label"]).long()
    v1, v2 = torch.from_numpy(va["eeg1"]), torch.from_numpy(va["eeg2"])
    f1s, losses = [], []
    for ep in range(epochs):
        model.train()
        ep_loss, nb = 0.0, 0
        for i in range(0, len(y), batch):
            idx = torch.from_numpy(perms[ep][i:i + batch])
            opt.zero_grad()
            out = model(e1[idx], e2[idx], y[idx])
            loss = (out["loss_ce"] + 0.5 * out["loss_ibs_cls"]
                    + 0.3 * model.compute_ibs_contrastive_loss(
                        out["ibs_token"], y[idx]))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=1.0)
            opt.step()
            ep_loss += float(loss.detach())
            nb += 1
        sched.step()
        model.eval()
        with torch.no_grad():
            preds = model(v1, v2)["logits"].argmax(-1).numpy()
        f1s.append(macro_f1(va["label"], preds))
        losses.append(ep_loss / nb)
        log(f"[torch] epoch {ep}: loss={losses[-1]:.4f} val_f1={f1s[-1]:.4f}")
    return {"val_f1": f1s, "train_loss": losses}


def train_flax(params0, tr, va, epochs, batch, lr, wd, perms, log):
    import jax
    import jax.numpy as jnp
    import optax

    from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
    from eyegaze_tpu.train.losses import cross_entropy, ibs_contrastive_loss

    model = DualEEGTransformer(
        sampling_rate=256.0, use_spectrogram=True, use_ibs=True,
        use_robust_ibs=True, use_cross_attention=True, **GEOM)

    steps_per_epoch = math.ceil(len(tr["label"]) / batch)

    def schedule(step):
        # Reproduce per-epoch CosineAnnealingLR: every step of epoch `ep`
        # uses the value the torch scheduler holds DURING that epoch.
        ep = step // steps_per_epoch
        return lr * (1 + jnp.cos(jnp.pi * ep / epochs)) / 2

    # torch AdamW semantics: decoupled decay on EVERY parameter (no mask),
    # betas (0.9, 0.999), eps 1e-8; clip BEFORE the update like
    # clip_grad_norm_ before opt.step().
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                                 weight_decay=wd))
    opt_state = tx.init(params0)
    params = params0

    def loss_fn(p, b1, b2, yb):
        out = model.apply({"params": p}, b1, b2)
        loss = cross_entropy(out["logits"], yb)
        loss += 0.5 * cross_entropy(out["ibs_logits"], yb)
        loss += 0.3 * ibs_contrastive_loss(out["ibs_token"], yb)
        return loss

    @jax.jit
    def step(params, opt_state, b1, b2, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, b1, b2, yb)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, b1, b2):
        return jnp.argmax(model.apply({"params": params}, b1, b2)["logits"],
                          -1)

    e1, e2 = jnp.asarray(tr["eeg1"]), jnp.asarray(tr["eeg2"])
    y = jnp.asarray(tr["label"], jnp.int32)
    v1, v2 = jnp.asarray(va["eeg1"]), jnp.asarray(va["eeg2"])
    f1s, losses = [], []
    for ep in range(epochs):
        ep_loss, nb = 0.0, 0
        for i in range(0, len(tr["label"]), batch):
            idx = jnp.asarray(perms[ep][i:i + batch])
            params, opt_state, loss = step(params, opt_state, e1[idx],
                                           e2[idx], y[idx])
            ep_loss += float(loss)
            nb += 1
        preds = np.asarray(predict(params, v1, v2))
        f1s.append(macro_f1(va["label"], preds))
        losses.append(ep_loss / nb)
        log(f"[flax]  epoch {ep}: loss={losses[-1]:.4f} val_f1={f1s[-1]:.4f}")
    return {"val_f1": f1s, "train_loss": losses}


def run(epochs=8, n=72, t=512, batch=8, lr=3e-3, wd=1e-4, seed=123,
        noise_std=0.5, log=lambda s: print(s, file=sys.stderr, flush=True)):
    import jax

    from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
    from eyegaze_tpu.models.torch_port import port_dual_eeg_state_dict

    tr, va = make_splits(n, t, seed, noise_std)
    rng = np.random.default_rng(seed + 1)
    # Pad the final ragged batch the same way on both sides: simple
    # sequential slices over one shared permutation per epoch.
    perms = [rng.permutation(len(tr["label"])) for _ in range(epochs)]

    tm = build_torch_model(seed=0)
    state = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    fm = DualEEGTransformer(
        sampling_rate=256.0, use_spectrogram=True, use_ibs=True,
        use_robust_ibs=True, use_cross_attention=True, **GEOM)
    import jax.numpy as jnp
    z = jnp.zeros((1, GEOM["in_channels"], t), jnp.float32)
    params = fm.init(jax.random.PRNGKey(0), z, z)["params"]
    params = port_dual_eeg_state_dict(params, state)  # identical init

    log("[equiv] training torch reference model...")
    tres = train_torch(tm, tr, va, epochs, batch, lr, wd, perms, log)
    log("[equiv] training flax model...")
    fres = train_flax(params, tr, va, epochs, batch, lr, wd, perms, log)

    gaps = [abs(a - b) for a, b in zip(tres["val_f1"], fres["val_f1"])]
    return {
        "config": dict(epochs=epochs, n=n, t=t, batch=batch, lr=lr, wd=wd,
                       seed=seed, noise_std=noise_std, dropout=0.0,
                       objective="ce + 0.5*ibs_cls_ce + 0.3*ibs_contrastive",
                       optimizer="AdamW(betas=0.9/0.999, eps=1e-8, "
                                 "decay-all) + per-epoch cosine + clip 1.0",
                       init="torch state_dict ported to flax", **GEOM),
        "torch": tres,
        "flax": fres,
        "f1_gap_per_epoch": gaps,
        "f1_gap_final": gaps[-1],
        "f1_gap_max": max(gaps),
        "loss_gap_final": abs(tres["train_loss"][-1]
                              - fres["train_loss"][-1]),
    }


# ---------------------------------------------------------------------------
# Gaze family (VERDICT r4 Weak #7): the reference EarlyFusionViT recipe —
# /root/reference/4_Experiments/scripts/train_gaze_earlyfusion.py:190-320,
# 406-445: AdamW + linear-warmup-then-cosine LambdaLR stepped PER BATCH
# (:93-118), weighted CE with inverse-frequency class weights
# (gaze_pair_dataset.py:110-130), grad clip.  AMP note: the reference enables
# autocast only when CUDA is available (:425-427 `fp16 and
# torch.cuda.is_available()`), so its own CPU behavior — and therefore this
# CPU equivalence run — is f32 on both sides; bf16-vs-AMP equivalence on
# accelerators is a hardware-numerics question outside a recipe test.
# Torch backbone: the reference wraps `timm.create_model` (not installed
# here), so the torch side uses the minimal timm-naming-parity ViT whose
# forward is already pinned against the Flax port (tests/test_vit_port.py) —
# the RECIPE under test is the reference's verbatim; the backbone is the
# proven-equivalent stand-in.
# ---------------------------------------------------------------------------

# patch pinned to 16: the Flax EarlyFusionViT wrapper (like the reference's
# timm vit_base_patch16 wrapper) does not expose patch_size.
GAZE_GEOM = dict(img=32, patch=16, embed=64, depth=2, heads=4, num_classes=3)


def make_gaze_splits(n, seed, noise_std, val_frac=1 / 3):
    """Class-structured synthetic image pairs with IMBALANCED labels (so the
    weighted-CE term is actually exercised): each class adds a fixed random
    low-contrast pattern to both images of the pair."""
    rng = np.random.default_rng(seed)
    s = GAZE_GEOM["img"]
    # Imbalance ~ 3:2:1, shuffled.
    counts = [n // 2, n // 3, n - n // 2 - n // 3]
    labels = rng.permutation(np.repeat(np.arange(3), counts)).astype(np.int64)
    patterns = rng.normal(size=(3, 3, s, s)).astype(np.float32)
    img1 = (patterns[labels] + noise_std
            * rng.normal(size=(n, 3, s, s))).astype(np.float32)
    img2 = (patterns[labels] + noise_std
            * rng.normal(size=(n, 3, s, s))).astype(np.float32)
    n_val = int(n * val_frac)
    tr = {"img1": img1[:-n_val], "img2": img2[:-n_val],
          "label": labels[:-n_val]}
    va = {"img1": img1[-n_val:], "img2": img2[-n_val:],
          "label": labels[-n_val:]}
    return tr, va


def reference_class_weights(labels, num_classes=3):
    """gaze_pair_dataset.py:110-130: total / (num_classes * count)."""
    counts = np.bincount(labels, minlength=num_classes)
    return (len(labels) / (num_classes * np.maximum(counts, 1))).astype(
        np.float32)


def warmup_cosine_lambda(step, warmup_steps, total_steps):
    """train_gaze_earlyfusion.py:109-116, exact."""
    if step < warmup_steps:
        return float(step) / float(max(1, warmup_steps))
    progress = float(step - warmup_steps) / float(
        max(1, total_steps - warmup_steps))
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))


def jnp_warmup_cosine(base_lr, warmup_steps, total_steps):
    """jnp schedule matching ``warmup_cosine_lambda`` exactly (one shared
    implementation for every flax family — round-5 review dedup; the torch
    lambda above stays a deliberately literal transcription of
    train_gaze_earlyfusion.py:109-116)."""
    import jax.numpy as jnp

    def s(step):
        frac = jnp.where(
            step < warmup_steps,
            step / max(1, warmup_steps),
            jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(
                jnp.pi * (step - warmup_steps)
                / max(1, total_steps - warmup_steps)))))
        return base_lr * frac
    return s


def build_torch_gaze_model(seed):
    """6-channel concat EarlyFusionViT (early_fusion_vit.py:32-177 geometry:
    concat fusion = 6-ch patch embed on cat([img_a, img_b], dim=1)), as a
    timm-naming-parity module under `backbone.` so the trained state ports
    through port_gaze_early_state_dict."""
    import torch
    import torch.nn as nn

    g = GAZE_GEOM
    torch.manual_seed(seed)

    class TorchViT6(nn.Module):
        def __init__(self):
            super().__init__()
            img, patch, embed = g["img"], g["patch"], g["embed"]
            self.heads = g["heads"]
            n = (img // patch) ** 2
            self.patch_embed = nn.Module()
            self.patch_embed.proj = nn.Conv2d(6, embed, patch, patch)
            self.cls_token = nn.Parameter(torch.randn(1, 1, embed) * 0.02)
            self.pos_embed = nn.Parameter(torch.randn(1, n + 1, embed) * 0.02)
            self.blocks = nn.ModuleList()
            for _ in range(g["depth"]):
                blk = nn.Module()
                blk.norm1 = nn.LayerNorm(embed, eps=1e-6)
                blk.attn = nn.Module()
                blk.attn.qkv = nn.Linear(embed, embed * 3)
                blk.attn.proj = nn.Linear(embed, embed)
                blk.norm2 = nn.LayerNorm(embed, eps=1e-6)
                blk.mlp = nn.Module()
                blk.mlp.fc1 = nn.Linear(embed, embed * 4)
                blk.mlp.fc2 = nn.Linear(embed * 4, embed)
                self.blocks.append(blk)
            self.norm = nn.LayerNorm(embed, eps=1e-6)
            self.head = nn.Linear(embed, g["num_classes"])

        def forward(self, x):
            b = x.shape[0]
            h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            h = torch.cat([self.cls_token.expand(b, -1, -1), h], dim=1)
            h = h + self.pos_embed
            e = h.shape[-1]
            hd = e // self.heads
            for blk in self.blocks:
                y = blk.norm1(h)
                qkv = blk.attn.qkv(y).reshape(b, -1, 3, self.heads, hd)
                q, k, v = (t.transpose(1, 2) for t in qkv.unbind(2))
                attn = ((q @ k.transpose(-2, -1)) / (hd ** 0.5)).softmax(-1)
                y = (attn @ v).transpose(1, 2).reshape(b, -1, e)
                h = h + blk.attn.proj(y)
                y = blk.norm2(h)
                h = h + blk.mlp.fc2(
                    torch.nn.functional.gelu(blk.mlp.fc1(y)))
            return self.head(self.norm(h)[:, 0])

    class TorchEarlyFusion(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TorchViT6()

        def forward(self, a, b):
            return self.backbone(torch.cat([a, b], dim=1))

    return TorchEarlyFusion()


def train_torch_gaze(model, tr, va, epochs, batch, lr, wd, warmup_epochs,
                     perms, log):
    import torch

    w = torch.from_numpy(reference_class_weights(tr["label"]))
    criterion = torch.nn.CrossEntropyLoss(weight=w)
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=wd)
    steps_per_epoch = math.ceil(len(tr["label"]) / batch)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda s: warmup_cosine_lambda(
            s, warmup_epochs * steps_per_epoch, epochs * steps_per_epoch))
    a1 = torch.from_numpy(tr["img1"])
    a2 = torch.from_numpy(tr["img2"])
    y = torch.from_numpy(tr["label"]).long()
    v1, v2 = torch.from_numpy(va["img1"]), torch.from_numpy(va["img2"])
    f1s, losses = [], []
    for ep in range(epochs):
        model.train()
        ep_loss, nb = 0.0, 0
        for i in range(0, len(y), batch):
            idx = torch.from_numpy(perms[ep][i:i + batch])
            opt.zero_grad()
            loss = criterion(model(a1[idx], a2[idx]), y[idx])
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=1.0)
            opt.step()
            sched.step()  # per-batch (train_gaze_earlyfusion.py:248-249)
            ep_loss += float(loss.detach())
            nb += 1
        model.eval()
        with torch.no_grad():
            preds = model(v1, v2).argmax(-1).numpy()
        f1s.append(macro_f1(va["label"], preds))
        losses.append(ep_loss / nb)
        log(f"[torch] epoch {ep}: loss={losses[-1]:.4f} val_f1={f1s[-1]:.4f}")
    return {"val_f1": f1s, "train_loss": losses}


def train_flax_gaze(params0, tr, va, epochs, batch, lr, wd, warmup_epochs,
                    perms, log):
    import jax
    import jax.numpy as jnp
    import optax

    from eyegaze_tpu.models.vit import EarlyFusionViT
    from eyegaze_tpu.train.losses import weighted_cross_entropy

    g = GAZE_GEOM
    model = EarlyFusionViT(num_classes=g["num_classes"], img_size=g["img"],
                           fusion_mode="concat", embed_dim=g["embed"],
                           depth=g["depth"], num_heads=g["heads"])
    cw = jnp.asarray(reference_class_weights(tr["label"]))
    steps_per_epoch = math.ceil(len(tr["label"]) / batch)
    warmup_steps = warmup_epochs * steps_per_epoch
    total_steps = epochs * steps_per_epoch

    schedule = jnp_warmup_cosine(lr, warmup_steps, total_steps)

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                                 weight_decay=wd))
    opt_state = tx.init(params0)
    params = params0

    def loss_fn(p, b1, b2, yb):
        return weighted_cross_entropy(
            model.apply({"params": p}, b1, b2), yb, cw)

    @jax.jit
    def step(params, opt_state, b1, b2, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, b1, b2, yb)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, b1, b2):
        return jnp.argmax(model.apply({"params": params}, b1, b2), -1)

    a1, a2 = jnp.asarray(tr["img1"]), jnp.asarray(tr["img2"])
    y = jnp.asarray(tr["label"], jnp.int32)
    v1, v2 = jnp.asarray(va["img1"]), jnp.asarray(va["img2"])
    f1s, losses = [], []
    for ep in range(epochs):
        ep_loss, nb = 0.0, 0
        for i in range(0, len(tr["label"]), batch):
            idx = jnp.asarray(perms[ep][i:i + batch])
            params, opt_state, loss = step(params, opt_state, a1[idx],
                                           a2[idx], y[idx])
            ep_loss += float(loss)
            nb += 1
        preds = np.asarray(predict(params, v1, v2))
        f1s.append(macro_f1(va["label"], preds))
        losses.append(ep_loss / nb)
        log(f"[flax]  epoch {ep}: loss={losses[-1]:.4f} val_f1={f1s[-1]:.4f}")
    return {"val_f1": f1s, "train_loss": losses}


def run_gaze(epochs=8, n=72, batch=8, lr=1e-3, wd=1e-4, seed=123,
             noise_std=1.0, warmup_epochs=1,
             log=lambda s: print(s, file=sys.stderr, flush=True)):
    import jax
    import jax.numpy as jnp

    from eyegaze_tpu.models.torch_port import port_gaze_early_state_dict
    from eyegaze_tpu.models.vit import EarlyFusionViT

    g = GAZE_GEOM
    tr, va = make_gaze_splits(n, seed, noise_std)
    rng = np.random.default_rng(seed + 1)
    perms = [rng.permutation(len(tr["label"])) for _ in range(epochs)]

    tm = build_torch_gaze_model(seed=0)
    state = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    fm = EarlyFusionViT(num_classes=g["num_classes"], img_size=g["img"],
                        fusion_mode="concat", embed_dim=g["embed"],
                        depth=g["depth"], num_heads=g["heads"])
    z = jnp.zeros((1, 3, g["img"], g["img"]), jnp.float32)
    params = fm.init(jax.random.PRNGKey(0), z, z)["params"]
    params = port_gaze_early_state_dict(params, state)  # identical init

    log("[equiv/gaze] training torch reference recipe...")
    tres = train_torch_gaze(tm, tr, va, epochs, batch, lr, wd, warmup_epochs,
                            perms, log)
    log("[equiv/gaze] training flax recipe...")
    fres = train_flax_gaze(params, tr, va, epochs, batch, lr, wd,
                           warmup_epochs, perms, log)

    gaps = [abs(a - b) for a, b in zip(tres["val_f1"], fres["val_f1"])]
    return {
        "family": "gaze",
        "config": dict(epochs=epochs, n=n, batch=batch, lr=lr, wd=wd,
                       seed=seed, noise_std=noise_std,
                       warmup_epochs=warmup_epochs, dropout=0.0,
                       objective="weighted CE (inverse-frequency weights)",
                       optimizer="AdamW + per-BATCH linear-warmup-cosine "
                                 "LambdaLR + clip 1.0",
                       init="torch state_dict ported to flax "
                            "(port_gaze_early_state_dict)", **GAZE_GEOM),
        "torch": tres,
        "flax": fres,
        "f1_gap_per_epoch": gaps,
        "f1_gap_final": gaps[-1],
        "f1_gap_max": max(gaps),
        "loss_gap_final": abs(tres["train_loss"][-1]
                              - fres["train_loss"][-1]),
    }


# ---------------------------------------------------------------------------
# Multimodal family (round-5 extension, completing the reference's trainer
# trio): /root/reference/4_Experiments/scripts/train_multimodal_fuzzy_fusion.py
# — AdamW over THREE param groups (gaze/eeg encoders at encoder_lr, fusion at
# fusion_lr, :724-737), per-BATCH warmup-cosine LambdaLR (:199-214, scales
# every group), loss = CE(fused) + 0.3·CE(img_logits/T_img) +
# 0.3·CE(eeg_logits/T_eeg) + 0.1·temp_reg(0.5, 5.0) with T DETACHED
# (:420-460; fuzzy_gating_fusion.py:331), grad clip.  Torch side: the
# reference FuzzyGatingFusion + DualEEGTransformer imported verbatim, gaze
# backbone = the proven timm-naming stand-in (same composite construction as
# tests/test_torch_port.py::test_multimodal_port_forward_parity); ported to
# the Flax MultimodalFusionModel for identical init.  (The ART denoiser has
# NO reference trainer — art.py's objective is its internal MSELoss, already
# pinned by forward parity — so eeg/gaze/multimodal IS the complete recipe
# set.)
# ---------------------------------------------------------------------------

MM_GEOM = dict(img=32, vit_embed=64, vit_depth=2, vit_heads=4)


def build_torch_multimodal(seed, t):
    import torch
    import torch.nn as nn

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    try:
        from test_vit_port import TorchViT
    finally:
        sys.path.pop(0)
    fusion_path = Path("/root/reference/3_Models/fusion")
    sys.path.insert(0, str(fusion_path))
    try:
        import fuzzy_gating_fusion as ref_fuzzy
    finally:
        sys.path.remove(str(fusion_path))
    sys.path.insert(0, str(REF_BACKBONES))
    try:
        import dual_eeg_transformer as ref_dual
    finally:
        sys.path.remove(str(REF_BACKBONES))

    g, m = GEOM, MM_GEOM
    # Conv-frontend keys stay at BOTH sides' defaults (kernel 25 / stride 4
    # / 2 layers): the Flax MultimodalFusionModel pins them there.
    eeg_kwargs = {k: v for k, v in g.items() if not k.startswith("conv_")}
    torch.manual_seed(seed)
    backbone = TorchViT(img=m["img"], patch=16, embed=m["vit_embed"],
                        depth=m["vit_depth"], heads=m["vit_heads"],
                        num_classes=g["num_classes"])
    backbone.patch_embed.proj = nn.Conv2d(6, m["vit_embed"], 16, 16)
    eeg = ref_dual.DualEEGTransformer(
        dropout=0.0, sampling_rate=256, use_spectrogram=True, use_ibs=True,
        use_robust_ibs=True, use_cross_attention=True, **eeg_kwargs)
    fusion = ref_fuzzy.FuzzyGatingFusion(num_classes=g["num_classes"])

    composite = nn.Module()
    composite.gaze_encoder = nn.Module()
    composite.gaze_encoder.backbone = backbone
    composite.eeg_encoder = eeg
    composite.fusion = fusion
    return composite


def make_mm_splits(n, t, seed, noise_std, img_noise, val_frac=1 / 3):
    """Coupled-pair EEG (the EEG family's fixtures) + images whose class
    pattern FOLLOWS the same labels — one consistent multimodal example."""
    from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset

    d = synthetic_eeg_pair_dataset(n=n, C=GEOM["in_channels"], T=t, seed=seed,
                                   noise_std=noise_std)
    s = MM_GEOM["img"]
    rng = np.random.default_rng(seed + 7)
    patterns = rng.normal(size=(3, 3, s, s)).astype(np.float32)
    labels = d["label"]
    img1 = (patterns[labels] + img_noise
            * rng.normal(size=(n, 3, s, s))).astype(np.float32)
    img2 = (patterns[labels] + img_noise
            * rng.normal(size=(n, 3, s, s))).astype(np.float32)
    n_val = int(n * val_frac)

    def cut(sl):
        return {"img1": img1[sl], "img2": img2[sl], "eeg1": d["eeg1"][sl],
                "eeg2": d["eeg2"][sl], "label": labels[sl]}

    return cut(slice(None, -n_val)), cut(slice(-n_val, None))


def train_torch_multimodal(composite, tr, va, epochs, batch, enc_lr, fus_lr,
                           wd, warmup_epochs, perms, log):
    import torch
    import torch.nn.functional as F

    steps_per_epoch = math.ceil(len(tr["label"]) / batch)
    opt = torch.optim.AdamW(
        [{"params": composite.gaze_encoder.parameters(), "lr": enc_lr},
         {"params": composite.eeg_encoder.parameters(), "lr": enc_lr},
         {"params": composite.fusion.parameters(), "lr": fus_lr}],
        weight_decay=wd)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda s: warmup_cosine_lambda(
            s, warmup_epochs * steps_per_epoch, epochs * steps_per_epoch))
    ten = {k: torch.from_numpy(v) for k, v in tr.items()}
    y = ten["label"].long()
    vten = {k: torch.from_numpy(v) for k, v in va.items()}

    def forward(b):
        img_logits = composite.gaze_encoder.backbone(
            torch.cat([b["img1"], b["img2"]], 1))
        eeg_logits = composite.eeg_encoder(b["eeg1"], b["eeg2"])["logits"]
        fused, alpha, aux = composite.fusion(img_logits, eeg_logits)
        return fused, img_logits, eeg_logits, aux

    f1s, losses = [], []
    for ep in range(epochs):
        composite.train()
        ep_loss, nb = 0.0, 0
        for i in range(0, len(y), batch):
            idx = torch.from_numpy(perms[ep][i:i + batch])
            b = {k: v[idx] for k, v in ten.items() if k != "label"}
            yb = y[idx]
            opt.zero_grad()
            fused, img_logits, eeg_logits, aux = forward(b)
            t_img = aux["temperatures"]["img"]
            t_eeg = aux["temperatures"]["eeg"]
            loss = (F.cross_entropy(fused, yb)
                    + 0.3 * F.cross_entropy(img_logits / t_img, yb)
                    + 0.3 * F.cross_entropy(eeg_logits / t_eeg, yb)
                    + 0.1 * composite.fusion.compute_temperature_regularization(
                        t_min=0.5, t_max=5.0))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(composite.parameters(), 1.0)
            opt.step()
            sched.step()
            ep_loss += float(loss.detach())
            nb += 1
        composite.eval()
        with torch.no_grad():
            fused, *_ = forward(vten)
            preds = fused.argmax(-1).numpy()
        f1s.append(macro_f1(va["label"], preds))
        losses.append(ep_loss / nb)
        log(f"[torch] epoch {ep}: loss={losses[-1]:.4f} val_f1={f1s[-1]:.4f}")
    return {"val_f1": f1s, "train_loss": losses}


def train_flax_multimodal(params0, tr, va, epochs, batch, enc_lr, fus_lr,
                          wd, warmup_epochs, perms, log):
    import jax
    import jax.numpy as jnp
    import optax

    from eyegaze_tpu.models.multimodal import MultimodalFusionModel
    from eyegaze_tpu.train.losses import cross_entropy

    g, m = GEOM, MM_GEOM
    model = MultimodalFusionModel(
        num_classes=g["num_classes"], gaze_fusion_mode="concat",
        eeg_in_channels=g["in_channels"], eeg_d_model=g["d_model"],
        eeg_num_layers=g["num_layers"], eeg_num_heads=g["num_heads"],
        eeg_d_ff=g["d_ff"], eeg_max_len=g["max_len"],
        vit_embed_dim=m["vit_embed"], vit_depth=m["vit_depth"],
        vit_num_heads=m["vit_heads"], img_size=m["img"], dropout=0.0)

    steps_per_epoch = math.ceil(len(tr["label"]) / batch)
    warmup_steps = warmup_epochs * steps_per_epoch
    total_steps = epochs * steps_per_epoch

    def schedule(base_lr):
        return jnp_warmup_cosine(base_lr, warmup_steps, total_steps)

    # Global clip FIRST (torch clips the whole model before opt.step), then
    # per-group AdamW: encoders at enc_lr, fusion at fus_lr — torch's
    # param_groups under one LambdaLR scale.  optax.adamw applies the
    # decoupled decay before scale_by_learning_rate, i.e. lr-scaled per
    # group, exactly torch AdamW's p -= lr*wd*p semantics.
    def group_of(path):
        return "fus" if path[0] == "fusion" else "enc"

    def make_labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: group_of([k.key for k in p]), params)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"enc": optax.adamw(schedule(enc_lr), b1=0.9, b2=0.999,
                                eps=1e-8, weight_decay=wd),
             "fus": optax.adamw(schedule(fus_lr), b1=0.9, b2=0.999,
                                eps=1e-8, weight_decay=wd)},
            make_labels))
    opt_state = tx.init(params0)
    params = params0

    def loss_fn(p, b1, b2, e1, e2, yb):
        out = model.apply({"params": p}, b1, b2, e1, e2)
        temps = out["aux_info"]["temperatures"]
        loss = cross_entropy(out["logits"], yb)
        loss += 0.3 * cross_entropy(out["img_logits"] / temps["img"], yb)
        loss += 0.3 * cross_entropy(out["eeg_logits"] / temps["eeg"], yb)
        loss += 0.1 * out["temp_reg"]
        return loss

    @jax.jit
    def step(params, opt_state, b1, b2, e1, e2, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, b1, b2, e1, e2, yb)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, b1, b2, e1, e2):
        return jnp.argmax(
            model.apply({"params": params}, b1, b2, e1, e2)["logits"], -1)

    dev = {k: jnp.asarray(v) for k, v in tr.items() if k != "label"}
    y = jnp.asarray(tr["label"], jnp.int32)
    vdev = {k: jnp.asarray(v) for k, v in va.items() if k != "label"}
    f1s, losses = [], []
    for ep in range(epochs):
        ep_loss, nb = 0.0, 0
        for i in range(0, len(tr["label"]), batch):
            idx = jnp.asarray(perms[ep][i:i + batch])
            params, opt_state, loss = step(
                params, opt_state, dev["img1"][idx], dev["img2"][idx],
                dev["eeg1"][idx], dev["eeg2"][idx], y[idx])
            ep_loss += float(loss)
            nb += 1
        preds = np.asarray(predict(params, vdev["img1"], vdev["img2"],
                                   vdev["eeg1"], vdev["eeg2"]))
        f1s.append(macro_f1(va["label"], preds))
        losses.append(ep_loss / nb)
        log(f"[flax]  epoch {ep}: loss={losses[-1]:.4f} val_f1={f1s[-1]:.4f}")
    return {"val_f1": f1s, "train_loss": losses}


def run_multimodal(epochs=6, n=48, t=512, batch=8, enc_lr=1e-3, fus_lr=5e-3,
                   wd=1e-4, seed=123, noise_std=0.5, img_noise=1.0,
                   warmup_epochs=1,
                   log=lambda s: print(s, file=sys.stderr, flush=True)):
    import jax
    import jax.numpy as jnp

    from eyegaze_tpu.models.multimodal import MultimodalFusionModel
    from eyegaze_tpu.models.torch_port import port_multimodal_state_dict

    g, m = GEOM, MM_GEOM
    tr, va = make_mm_splits(n, t, seed, noise_std, img_noise)
    rng = np.random.default_rng(seed + 1)
    perms = [rng.permutation(len(tr["label"])) for _ in range(epochs)]

    composite = build_torch_multimodal(seed=0, t=t)
    state = {k: v.detach().cpu().numpy()
             for k, v in composite.state_dict().items()}

    fm = MultimodalFusionModel(
        num_classes=g["num_classes"], gaze_fusion_mode="concat",
        eeg_in_channels=g["in_channels"], eeg_d_model=g["d_model"],
        eeg_num_layers=g["num_layers"], eeg_num_heads=g["num_heads"],
        eeg_d_ff=g["d_ff"], eeg_max_len=g["max_len"],
        vit_embed_dim=m["vit_embed"], vit_depth=m["vit_depth"],
        vit_num_heads=m["vit_heads"], img_size=m["img"], dropout=0.0)
    zi = jnp.zeros((1, 3, m["img"], m["img"]), jnp.float32)
    ze = jnp.zeros((1, g["in_channels"], t), jnp.float32)
    params = fm.init(jax.random.PRNGKey(0), zi, zi, ze, ze)["params"]
    params = port_multimodal_state_dict(params, state)  # identical init

    log("[equiv/mm] training torch reference recipe...")
    tres = train_torch_multimodal(composite, tr, va, epochs, batch, enc_lr,
                                  fus_lr, wd, warmup_epochs, perms, log)
    log("[equiv/mm] training flax recipe...")
    fres = train_flax_multimodal(params, tr, va, epochs, batch, enc_lr,
                                 fus_lr, wd, warmup_epochs, perms, log)

    gaps = [abs(a - b) for a, b in zip(tres["val_f1"], fres["val_f1"])]
    return {
        "family": "multimodal",
        "config": dict(epochs=epochs, n=n, t=t, batch=batch,
                       encoder_lr=enc_lr, fusion_lr=fus_lr, wd=wd, seed=seed,
                       noise_std=noise_std, img_noise=img_noise,
                       warmup_epochs=warmup_epochs, dropout=0.0,
                       objective="CE(fused) + 0.3*CE(img/T) + 0.3*CE(eeg/T) "
                                 "+ 0.1*temp_reg(0.5,5.0), T detached",
                       optimizer="AdamW 3 param groups (enc/enc/fusion LRs)"
                                 " + per-BATCH warmup-cosine + clip 1.0",
                       init="torch composite state_dict ported to flax "
                            "(port_multimodal_state_dict)",
                       eeg_conv="both sides' defaults (25/4/2)",
                       **{k: v for k, v in GEOM.items()
                          if not k.startswith("conv_")}, **MM_GEOM),
        "torch": tres,
        "flax": fres,
        "f1_gap_per_epoch": gaps,
        "f1_gap_final": gaps[-1],
        "f1_gap_max": max(gaps),
        "loss_gap_final": abs(tres["train_loss"][-1]
                              - fres["train_loss"][-1]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("eeg", "gaze", "multimodal"),
                    default="eeg")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n", type=int, default=72)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--noise-std", type=float, default=None)
    ap.add_argument("--warmup-epochs", type=int, default=1)
    args = ap.parse_args()

    if args.family == "gaze":
        res = run_gaze(args.epochs, args.n, args.batch,
                       args.lr if args.lr is not None else 1e-3, args.wd,
                       args.seed,
                       args.noise_std if args.noise_std is not None else 1.0,
                       args.warmup_epochs)
        print(json.dumps(res, indent=2))
        return 0

    if args.family == "multimodal":
        if not REF_BACKBONES.exists():
            print(json.dumps({"error": "reference checkout not mounted"}))
            return 1
        # Every relevant CLI knob forwards (round-5 review: an earlier cut
        # silently ignored --n/--t/--lr/--noise-std and capped --epochs,
        # making the recorded config contradict the invocation).  --lr sets
        # the ENCODER lr; the fusion lr stays the reference-style 5x ratio.
        lr = args.lr if args.lr is not None else 1e-3
        res = run_multimodal(
            epochs=args.epochs, n=args.n, t=args.t, batch=args.batch,
            enc_lr=lr, fus_lr=5 * lr, wd=args.wd, seed=args.seed,
            noise_std=(args.noise_std if args.noise_std is not None else 0.5),
            warmup_epochs=args.warmup_epochs)
        print(json.dumps(res, indent=2))
        return 0

    if not REF_BACKBONES.exists():
        print(json.dumps({"error": "reference checkout not mounted"}))
        return 1

    res = run(args.epochs, args.n, args.t, args.batch,
              args.lr if args.lr is not None else 3e-3, args.wd,
              args.seed,
              args.noise_std if args.noise_std is not None else 0.5)
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
