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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n", type=int, default=72)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--noise-std", type=float, default=0.5)
    args = ap.parse_args()

    if not REF_BACKBONES.exists():
        print(json.dumps({"error": "reference checkout not mounted"}))
        return 1

    res = run(args.epochs, args.n, args.t, args.batch, args.lr, args.wd,
              args.seed, args.noise_std)
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
