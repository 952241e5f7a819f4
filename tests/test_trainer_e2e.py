"""End-to-end trainer tests: fit loop, checkpointing, resume, learning signal."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eyegaze_tpu.data.loader import ArrayDataset, batch_iterator
from eyegaze_tpu.data.synthetic import synthetic_gaze_pair_dataset
from eyegaze_tpu.models.vit import EarlyFusionViT
from eyegaze_tpu.train.losses import cross_entropy
from eyegaze_tpu.train.optim import make_optimizer
from eyegaze_tpu.train.state import create_train_state
from eyegaze_tpu.train.trainer import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def setup():
    data = synthetic_gaze_pair_dataset(n=36, H=32, W=32, seed=0)
    ds = ArrayDataset({"img1": data["img1"], "img2": data["img2"],
                       "label": data["label"]})
    train = ArrayDataset({k: v[:30] for k, v in ds.arrays.items()})
    val = ArrayDataset({k: v[30:] for k, v in ds.arrays.items()})
    model = EarlyFusionViT(num_classes=3, img_size=32, embed_dim=32, depth=1,
                           num_heads=4, fusion_mode="add")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(train[np.arange(1)]["img1"]),
                           jnp.asarray(train[np.arange(1)]["img2"]))
    return model, variables, train, val


def _make_trainer(model, variables, tmp_path, epochs=3):
    # Fresh buffers: the trainer donates the state, which would delete the
    # module-scoped fixture's arrays.
    variables = jax.tree_util.tree_map(jnp.array, variables)
    tx = make_optimizer(3e-3)
    state = create_train_state(model, variables, tx)

    def loss_fn(params, batch, rng, step):
        logits = model.apply({"params": params}, jnp.asarray(batch["img1"]),
                             jnp.asarray(batch["img2"]),
                             deterministic=False, rngs={"dropout": rng})
        return cross_entropy(logits, jnp.asarray(batch["label"])), {"logits": logits}

    def eval_fn(params, batch):
        return model.apply({"params": params}, jnp.asarray(batch["img1"]),
                           jnp.asarray(batch["img2"]))

    return Trainer(state, loss_fn, eval_fn,
                   TrainerConfig(num_epochs=epochs, checkpoint_dir=str(tmp_path),
                                 save_every_epochs=2, seed=0))


def test_fit_learns_and_checkpoints(tmp_path, setup):
    model, variables, train, val = setup
    trainer = _make_trainer(model, variables, tmp_path, epochs=4)
    result = trainer.fit(
        train_batches_fn=lambda e: batch_iterator(train, 10, shuffle=True,
                                                  seed=0, epoch=e),
        eval_batches_fn=lambda: batch_iterator(val, 6),
        config_dict={"model": {"kind": "tiny-vit"}},
    )
    hist = result["history"]
    assert len(hist) == 4
    assert "train/grad_norm" in hist[0]
    assert hist[0]["train/grad_norm"] > 0
    # Loss decreases over training (class-structured data, tiny model).
    assert hist[-1]["train/loss"] < hist[0]["train/loss"]
    assert result["best_metric"] is not None
    assert (tmp_path / "best_model").is_dir()
    assert (tmp_path / "checkpoint_epoch_1").is_dir()
    meta = trainer.ckpt.load_meta("best_model")
    assert meta["config"]["model"]["kind"] == "tiny-vit"


def test_watch_histograms(tmp_path, setup):
    """wandb.watch role: param/grad histograms every N epochs."""
    model, variables, train, val = setup
    variables = jax.tree_util.tree_map(jnp.array, variables)
    tx = make_optimizer(3e-3)
    state = create_train_state(model, variables, tx)

    def loss_fn(params, batch, rng, step):
        logits = model.apply({"params": params}, jnp.asarray(batch["img1"]),
                             jnp.asarray(batch["img2"]),
                             deterministic=False, rngs={"dropout": rng})
        return cross_entropy(logits, jnp.asarray(batch["label"])), {"logits": logits}

    def eval_fn(params, batch):
        return model.apply({"params": params}, jnp.asarray(batch["img1"]),
                           jnp.asarray(batch["img2"]))

    records = []
    trainer = Trainer(state, loss_fn, eval_fn,
                      TrainerConfig(num_epochs=2, seed=0, watch_every_epochs=2),
                      watch_logger=records.append)
    trainer.fit(lambda e: batch_iterator(train, 10, seed=0, epoch=e),
                lambda: batch_iterator(val, 6))
    assert len(records) == 1
    rec = records[0]
    param_keys = [k for k in rec if k.startswith("param/")]
    grad_keys = [k for k in rec if k.startswith("grad/")]
    assert param_keys and len(param_keys) == len(grad_keys)
    h = rec[param_keys[0]]
    assert len(h["counts"]) == 20 and h["l2"] > 0


def test_trainer_custom_eval_metrics(tmp_path, setup):
    """Regression-style eval (the ART path): eval_metrics_fn dict means."""
    model, variables, train, val = setup
    variables = jax.tree_util.tree_map(jnp.array, variables)
    state = create_train_state(model, variables, make_optimizer(3e-3))

    def loss_fn(params, batch, rng, step):
        logits = model.apply({"params": params}, jnp.asarray(batch["img1"]),
                             jnp.asarray(batch["img2"]),
                             deterministic=False, rngs={"dropout": rng})
        return cross_entropy(logits, jnp.asarray(batch["label"])), {}

    def eval_metrics_fn(params, batch):
        logits = model.apply({"params": params}, jnp.asarray(batch["img1"]),
                             jnp.asarray(batch["img2"]))
        return {"loss": cross_entropy(logits, jnp.asarray(batch["label"]))}

    trainer = Trainer(state, loss_fn, None,
                      TrainerConfig(num_epochs=1, metric_for_best="loss",
                                    greater_is_better=False,
                                    checkpoint_dir=str(tmp_path), seed=0),
                      eval_metrics_fn=eval_metrics_fn)
    result = trainer.fit(lambda e: batch_iterator(train, 10, seed=0, epoch=e),
                         lambda: batch_iterator(val, 6))
    assert "val/loss" in result["history"][0]
    assert result["best_metric"] is not None
    assert (tmp_path / "best_model").is_dir()


def test_resume_continues(tmp_path, setup):
    model, variables, train, val = setup
    t1 = _make_trainer(model, variables, tmp_path / "a", epochs=2)
    t1.fit(lambda e: batch_iterator(train, 10, seed=0, epoch=e),
           lambda: batch_iterator(val, 6))
    step_before = int(t1.state.step)

    t2 = _make_trainer(model, variables, tmp_path / "a", epochs=2)
    latest = t2.ckpt.latest_epoch()
    assert latest == 1
    t2.state = t2.ckpt.restore(f"checkpoint_epoch_{latest}", t2.state)
    assert int(t2.state.step) == step_before
