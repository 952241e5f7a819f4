"""Learning-validation controls for the flagship model (VERDICT r1 Weak#4).

Two controls beyond "loss goes down on class-structured fixtures":

1. **Label-shuffle control** — training on permuted labels must fall to
   ~chance on the (true-labeled) validation set.  Catches label leakage
   through the split/window pipeline (the reference's known risk: windows of
   one trial can straddle train/val in stratified mode,
   dual_eeg_dataset.py:62-113).
2. **SNR sweep** — raising the broadband noise floor of the synthetic
   class-coupled EEG must degrade val macro-F1 gracefully, not cliff or stay
   flat (flat would mean the model keys on an artifact, not the coupling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eyegaze_tpu.data.loader import ArrayDataset, batch_iterator
from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset
from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
from eyegaze_tpu.train.losses import cross_entropy
from eyegaze_tpu.train.optim import make_optimizer
from eyegaze_tpu.train.state import create_train_state
from eyegaze_tpu.train.trainer import Trainer, TrainerConfig

C, T = 8, 256
N_TRAIN, N_VAL = 48, 24


def _data(noise_std=0.3, seed=0):
    d = synthetic_eeg_pair_dataset(n=N_TRAIN + N_VAL, C=C, T=T, seed=seed,
                                   noise_std=noise_std)
    arrays = {k: d[k] for k in ("eeg1", "eeg2", "label")}
    train = ArrayDataset({k: v[:N_TRAIN] for k, v in arrays.items()})
    val = ArrayDataset({k: v[N_TRAIN:] for k, v in arrays.items()})
    return train, val


def _train_val_f1(train, val, epochs=8, lr=3e-3, seed=0):
    model = DualEEGTransformer(
        in_channels=C, num_classes=3, d_model=32, num_layers=1, num_heads=2,
        d_ff=64, max_len=96, sampling_rate=256.0,
        use_spectrogram=True, use_ibs=True, use_robust_ibs=True,
        use_cross_attention=True,
    )
    e = jnp.asarray(train[np.arange(1)]["eeg1"])
    variables = model.init(jax.random.PRNGKey(seed), e, e)

    def loss_fn(params, batch, rng, step):
        out = model.apply({"params": params}, jnp.asarray(batch["eeg1"]),
                          jnp.asarray(batch["eeg2"]),
                          deterministic=False, rngs={"dropout": rng})
        return cross_entropy(out["logits"], jnp.asarray(batch["label"])), \
            {"logits": out["logits"]}

    def eval_fn(params, batch):
        out = model.apply({"params": params}, jnp.asarray(batch["eeg1"]),
                          jnp.asarray(batch["eeg2"]))
        return out["logits"]

    state = create_train_state(model, variables, make_optimizer(lr))
    trainer = Trainer(state, loss_fn, eval_fn,
                      TrainerConfig(num_epochs=epochs, seed=seed))
    trainer.fit(lambda ep: batch_iterator(train, 12, shuffle=True, seed=seed,
                                          epoch=ep))
    return trainer.evaluate(batch_iterator(val, 12))["val/f1_macro"]


@pytest.mark.slow
def test_label_shuffle_control_falls_to_chance():
    """Real labels learn; shuffled train labels score ~chance on true val."""
    train, val = _data(noise_std=0.3)
    f1_real = _train_val_f1(train, val)

    rng = np.random.default_rng(7)
    shuffled = ArrayDataset(dict(train.arrays,
                                 label=rng.permutation(train.arrays["label"])))
    f1_shuffled = _train_val_f1(shuffled, val)

    print(f"label-shuffle control: real F1={f1_real:.3f}, "
          f"shuffled F1={f1_shuffled:.3f}")
    assert f1_real > 0.75, f"model failed to learn real labels: {f1_real}"
    assert f1_shuffled < 0.55, (
        f"shuffled-label F1 {f1_shuffled} above chance band — "
        "possible leakage through the data pipeline")
    assert f1_real - f1_shuffled > 0.25


@pytest.mark.slow
def test_snr_sweep_degrades_gracefully():
    """val macro-F1 falls with the noise floor — no cliff, no flat line."""
    f1s = []
    for noise in (0.3, 1.2, 2.0):
        train, val = _data(noise_std=noise)
        f1s.append(_train_val_f1(train, val))
    print("SNR sweep (noise_std 0.3/1.2/2.0):",
          [round(f, 3) for f in f1s])
    # Measured profile (seed 0): ~1.0 -> ~0.55 -> ~0.17.
    assert f1s[0] > 0.75, f"clean-condition F1 too low: {f1s[0]}"
    assert 0.30 < f1s[1] < 0.95, (
        f"mid-SNR F1 {f1s[1]} not in the partial-signal band — degradation "
        "is a cliff (or absent), not graceful")
    assert f1s[2] < 0.45, f"high-noise F1 {f1s[2]} still above chance band"
    assert f1s[0] > f1s[1] > f1s[2], f"F1 not monotone in SNR: {f1s}"
