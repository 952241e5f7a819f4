"""Tests for losses, metrics (sklearn parity), optimizer groups, checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eyegaze_tpu.train.losses import (
    cross_entropy,
    ibs_alignment_loss,
    ibs_contrastive_loss,
    symmetry_loss,
    weighted_cross_entropy,
)
from eyegaze_tpu.train.metrics import classification_metrics, confusion_matrix, roc_curves
from eyegaze_tpu.train.optim import make_optimizer, warmup_cosine_schedule


def test_cross_entropy_torch_parity():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    r = np.random.default_rng(0)
    logits = r.normal(size=(16, 3)).astype(np.float32)
    labels = r.integers(0, 3, 16)
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    w = np.asarray([0.5, 1.5, 2.0], np.float32)
    got_w = float(weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                         jnp.asarray(w)))
    want_w = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels),
                                   weight=torch.from_numpy(w)))
    np.testing.assert_allclose(got_w, want_w, rtol=1e-5)


def test_metrics_sklearn_parity():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import (accuracy_score, confusion_matrix as sk_cm,
                                 precision_recall_fscore_support)

    r = np.random.default_rng(1)
    labels = r.integers(0, 3, 100)
    preds = r.integers(0, 3, 100)
    m = classification_metrics(jnp.asarray(labels), jnp.asarray(preds), 3)
    np.testing.assert_allclose(float(m["accuracy"]), accuracy_score(labels, preds),
                               rtol=1e-6)
    p, rec, f1, _ = precision_recall_fscore_support(labels, preds, average="macro",
                                                    zero_division=0)
    np.testing.assert_allclose(float(m["precision_macro"]), p, rtol=1e-5)
    np.testing.assert_allclose(float(m["recall_macro"]), rec, rtol=1e-5)
    np.testing.assert_allclose(float(m["f1_macro"]), f1, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m["confusion_matrix"]), sk_cm(labels, preds))


def test_roc_auc_sklearn_parity():
    from sklearn.metrics import roc_auc_score

    r = np.random.default_rng(2)
    labels = r.integers(0, 3, 200)
    logits = r.normal(size=(200, 3))
    logits[np.arange(200), labels] += 1.0  # informative scores
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    roc = roc_curves(labels, probs)
    want = roc_auc_score(labels, probs, multi_class="ovr", average="macro")
    np.testing.assert_allclose(roc["macro_auc"], want, atol=5e-3)


def test_roc_tied_scores_sklearn_parity():
    """Quantized probabilities produce many ties; curve + AUC must still match
    sklearn exactly (threshold-grouped, not per-sample path-dependent)."""
    from sklearn.metrics import auc as sk_auc
    from sklearn.metrics import roc_curve as sk_roc_curve

    r = np.random.default_rng(7)
    labels = r.integers(0, 3, 300)
    probs = r.normal(size=(300, 3))
    probs = np.round(np.exp(probs) / np.exp(probs).sum(1, keepdims=True), 1)
    roc = roc_curves(labels, probs)
    onehot = np.eye(3)[labels]
    for k in range(3):
        fpr_sk, tpr_sk, _ = sk_roc_curve(onehot[:, k], probs[:, k])
        np.testing.assert_allclose(roc["per_class"][k]["auc"],
                                   sk_auc(fpr_sk, tpr_sk), atol=1e-10)
        # Same curve support: every sklearn (fpr, tpr) vertex is on our curve.
        ours = set(zip(np.round(roc["per_class"][k]["fpr"], 12),
                       np.round(roc["per_class"][k]["tpr"], 12)))
        theirs = set(zip(np.round(fpr_sk, 12), np.round(tpr_sk, 12)))
        assert theirs <= ours


def test_contrastive_losses_behave():
    r = np.random.default_rng(3)
    d = 16
    # Clustered tokens: same-class tokens close together.
    centers = r.normal(size=(3, d)) * 5
    labels = np.repeat(np.arange(3), 8)
    clustered = centers[labels] + 0.1 * r.normal(size=(24, d))
    scattered = r.normal(size=(24, d)) * 5
    l_clustered = float(ibs_contrastive_loss(jnp.asarray(clustered), jnp.asarray(labels)))
    l_scattered = float(ibs_contrastive_loss(jnp.asarray(scattered), jnp.asarray(labels)))
    assert l_clustered < l_scattered

    # Alignment loss: ibs == cls1 should beat random.
    cls1 = r.normal(size=(8, d)).astype(np.float32)
    cls2 = r.normal(size=(8, d)).astype(np.float32)
    aligned = float(ibs_alignment_loss(jnp.asarray(cls1), jnp.asarray(cls1),
                                       jnp.asarray(cls2)))
    random = float(ibs_alignment_loss(jnp.asarray(r.normal(size=(8, d)).astype(np.float32)),
                                      jnp.asarray(cls1), jnp.asarray(cls2)))
    assert aligned < random
    assert float(symmetry_loss(jnp.asarray(cls1), jnp.asarray(cls1))) == 0.0


def test_optimizer_param_groups_and_freezing():
    import optax

    params = {
        "gaze_encoder": {"w": jnp.ones((4, 4))},
        "fusion": {"w": jnp.ones((4, 4))},
    }

    def group_of(path, _v):
        return "encoder" if path[0] == "gaze_encoder" else "fusion"

    tx = make_optimizer(1e-2, param_groups=group_of,
                        group_lrs={"encoder": 1e-3, "fusion": 1e-2},
                        frozen_groups=("encoder",), grad_clip=None)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["gaze_encoder"]["w"]).max()) == 0.0  # frozen
    assert float(jnp.abs(updates["fusion"]["w"]).max()) > 0.0


def test_warmup_cosine_schedule():
    sched = warmup_cosine_schedule(1e-3, warmup_steps=10, total_steps=100)
    assert float(sched(0)) < float(sched(5)) < float(sched(10))
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    assert float(sched(99)) < 1e-4


def test_checkpoint_roundtrip(tmp_path):
    from eyegaze_tpu.train.checkpoint import CheckpointManager
    from eyegaze_tpu.train.optim import make_optimizer
    from eyegaze_tpu.train.state import TrainState

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    tx = make_optimizer(1e-3)
    state = TrainState(step=7, params=params, opt_state=tx.init(params), tx=tx,
                       apply_fn=lambda *a: None)
    cm = CheckpointManager(tmp_path, metric_greater_is_better=True)
    assert cm.save_if_best(0.5, state, config={"model": {"d": 3}})
    assert not cm.save_if_best(0.4, state)  # worse -> not saved
    assert cm.save_if_best(0.6, state)
    cm.save_periodic(3, state)

    blank = TrainState(step=0, params={"w": jnp.zeros((2, 3))},
                       opt_state=tx.init(params), tx=tx, apply_fn=lambda *a: None)
    restored = cm.restore("best_model", blank)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    assert restored.step == 7
    assert cm.load_meta("best_model")["config"]["model"]["d"] == 3
    assert cm.latest_epoch() == 3
    # A fresh manager over the same dir resumes the best metric.
    cm2 = CheckpointManager(tmp_path)
    assert cm2.best_metric == pytest.approx(0.6)


def test_hypereeg_all_ablations():
    from eyegaze_tpu.models.hypereeg import ABLATIONS, create_hypereeg_model

    r = np.random.default_rng(5)
    e1 = jnp.asarray(r.normal(size=(2, 8, 256)).astype(np.float32))
    e2 = jnp.asarray(r.normal(size=(2, 8, 256)).astype(np.float32))
    for name in ABLATIONS:
        model = create_hypereeg_model(name, in_channels=8, embed_dim=32,
                                      num_heads=4, sinc_kernel_size=33)
        variables = model.init(jax.random.PRNGKey(0), e1, e2)
        out = model.apply(variables, e1, e2)
        assert out["logits"].shape == (2, 3), name
        assert np.isfinite(np.asarray(out["logits"])).all(), name


def test_hypereeg_param_count_near_spec():
    """Documented ~680K params at the full config (experiments_list.md:321)."""
    from eyegaze_tpu.models.hypereeg import create_hypereeg_model

    model = create_hypereeg_model("full", in_channels=32, embed_dim=128,
                                  num_heads=4, sinc_kernel_size=125)
    r = np.random.default_rng(6)
    e = jnp.asarray(r.normal(size=(1, 32, 1024)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), e, e)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 2e5 < n < 2e6, f"param count {n} far from the ~680K spec"


def test_hypereeg_presets():
    """Width presets (VERDICT r4 Weak #6): 'documented' pins the explicit
    hyperparameter list's 274,819 total; '680k' pins a total inside the
    statistics table's "~680K" budget (experiments_list.md:321-325) with the
    identical module diagram — only embed_dim is swept."""
    from eyegaze_tpu.models.hypereeg import PRESETS, create_hypereeg_model

    r = np.random.default_rng(7)
    e = jnp.asarray(r.normal(size=(1, 32, 1024)).astype(np.float32))

    def count(preset):
        model = create_hypereeg_model("full", preset=preset, in_channels=32)
        variables = model.init(jax.random.PRNGKey(0), e, e)
        return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))

    assert set(PRESETS) == {"documented", "680k"}
    assert count("documented") == 274_819
    assert count("680k") == 671_459  # embed 208: closest to 680K (-1.3%)


def test_time_fn_and_device_barrier():
    """Timing utils: burst timing closed by a host-fetch barrier (the only
    reliable completion fence on the relay backend — see profiler.py)."""
    import jax
    import jax.numpy as jnp

    from eyegaze_tpu.train.profiler import device_barrier, time_fn

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((8, 8))
    device_barrier(f(x))
    device_barrier({"a": f(x), "b": x})  # works on pytrees
    stats = time_fn(f, x, iters=3, reps=2, warmup=1)
    assert stats["mean_s"] > 0 and stats["reps"] == 2 and stats["iters"] == 3
