"""Shape/behavior tests for the Flax model zoo (reference test parity: each
model's in-file __main__ smoke tests, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eyegaze_tpu.models import (
    ArtConfig,
    ArtifactRemovalTransformer,
    DualEEGTransformer,
    EarlyFusionViT,
    FuzzyGatingFusion,
    LateFusionViT,
    MultimodalFusionModel,
    art_loss,
)

KEY = jax.random.PRNGKey(0)
B, C, T = 2, 8, 256


def _eeg_pair():
    r = np.random.default_rng(0)
    return (
        jnp.asarray(r.normal(size=(B, C, T)).astype(np.float32)),
        jnp.asarray(r.normal(size=(B, C, T)).astype(np.float32)),
    )


# ---------------------------------------------------------------------------
# DualEEGTransformer
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "flags, extra_tokens",
    [
        (dict(use_ibs=True, use_robust_ibs=True, use_spectrogram=True), 42 + C),
        (dict(use_ibs=True, use_robust_ibs=True, use_spectrogram=False), 42),
        (dict(use_ibs=True, use_robust_ibs=False, use_spectrogram=False), 1),
        (dict(use_ibs=False, use_spectrogram=False), 0),
        (dict(use_ibs=True, use_robust_ibs=True, use_spectrogram=True,
              ibs_feature_type="phase"), 24 + C),
        (dict(use_ibs=True, use_robust_ibs=True, use_spectrogram=True,
              ibs_feature_type="amplitude"), 18 + C),
        (dict(use_ibs=True, use_robust_ibs=True, use_spectrogram=True,
              use_cross_attention=False), 42 + C),
        (dict(use_ibs=True, use_robust_ibs=True, use_spectrogram=True,
              ibs_instance_norm=False), 42 + C),
    ],
)
def test_dual_eeg_ablations(flags, extra_tokens):
    model = DualEEGTransformer(
        in_channels=C, d_model=32, num_layers=2, num_heads=4, d_ff=64,
        max_len=128, **flags,
    )
    e1, e2 = _eeg_pair()
    variables = model.init(KEY, e1, e2)
    out = model.apply(variables, e1, e2)
    assert out["logits"].shape == (B, 3)
    assert out["cls1"].shape == (B, 32)
    assert out["cls2"].shape == (B, 32)
    if flags.get("use_ibs", True):
        assert out["ibs_logits"].shape == (B, 3)
        assert out["ibs_token"].shape == (B, 32)
    else:
        assert "ibs_logits" not in out
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_dual_eeg_capture_intermediates():
    model = DualEEGTransformer(
        in_channels=C, d_model=32, num_layers=1, num_heads=4, d_ff=64, max_len=128,
    )
    e1, e2 = _eeg_pair()
    variables = model.init(KEY, e1, e2)
    out, state = model.apply(
        variables, e1, e2, capture=True, mutable=["intermediates"]
    )
    inter = state["intermediates"]
    mats = inter["ibs_matrices"][0]
    assert mats.shape == (B, 6, 7, C, C)
    w = inter["cross_attn"]["attn_weights_1to2"][0]
    seq_len = 1 + 42 + C + T // 16
    assert w.shape == (B, 4, seq_len, seq_len)


def test_dual_eeg_grads_flow():
    model = DualEEGTransformer(
        in_channels=C, d_model=32, num_layers=1, num_heads=4, d_ff=64, max_len=128,
        use_spectrogram=False,
    )
    e1, e2 = _eeg_pair()
    variables = model.init(KEY, e1, e2)

    def loss_fn(params):
        out = model.apply({"params": params}, e1, e2)
        return jnp.sum(out["logits"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.8


# ---------------------------------------------------------------------------
# FuzzyGatingFusion (parity with its in-file unit tests, fuzzy_gating_fusion.py:430-538)
# ---------------------------------------------------------------------------

def _fuzzy_apply(mode, img_logits, eeg_logits):
    model = FuzzyGatingFusion(num_classes=3, mode=mode)
    variables = model.init(KEY, img_logits, eeg_logits)
    return model, variables, model.apply(variables, img_logits, eeg_logits)


def test_fuzzy_shapes_and_range():
    r = np.random.default_rng(1)
    img = jnp.asarray(r.normal(size=(8, 3)).astype(np.float32))
    eeg = jnp.asarray(r.normal(size=(8, 3)).astype(np.float32))
    _, _, (fused, alpha, aux) = _fuzzy_apply("full", img, eeg)
    assert fused.shape == (8, 3)
    assert alpha.shape == (8,)
    assert ((alpha >= 0) & (alpha <= 1)).all()
    for key in ["temperatures", "entropies", "membership", "firing_strengths",
                "consequents", "fuzz_params"]:
        assert key in aux


def test_fuzzy_gradients_all_params():
    r = np.random.default_rng(2)
    img = jnp.asarray(r.normal(size=(8, 3)).astype(np.float32))
    eeg = jnp.asarray(r.normal(size=(8, 3)).astype(np.float32))
    model = FuzzyGatingFusion(num_classes=3, mode="full")
    variables = model.init(KEY, img, eeg)

    def loss(params):
        fused, _, _ = model.apply({"params": params}, img, eeg)
        return jnp.sum(fused)

    grads = jax.grad(loss)(variables["params"])
    for name, g in grads.items():
        assert float(jnp.abs(g).sum()) > 0, f"no gradient for {name}"


def test_fuzzy_ablation_modes():
    r = np.random.default_rng(3)
    img = jnp.asarray(r.normal(size=(8, 3)).astype(np.float32))
    eeg = jnp.asarray(r.normal(size=(8, 3)).astype(np.float32))
    for mode in ("full", "no_temperature", "no_fuzzification", "fixed_weights"):
        _, _, (fused, alpha, _) = _fuzzy_apply(mode, img, eeg)
        assert np.isfinite(np.asarray(fused)).all()
        if mode == "fixed_weights":
            np.testing.assert_allclose(np.asarray(alpha), 0.5)


def test_fuzzy_confident_modality_wins():
    uniform = jnp.zeros((8, 3))
    confident = jnp.tile(jnp.asarray([[10.0, -10.0, -10.0]]), (8, 1))
    model = FuzzyGatingFusion(num_classes=3, mode="full")
    variables = model.init(KEY, uniform, uniform)
    _, a_conf_img, _ = model.apply(variables, confident, uniform)
    _, a_conf_eeg, _ = model.apply(variables, uniform, confident)
    assert float(a_conf_img.mean()) > float(a_conf_eeg.mean())


def test_fuzzy_temperature_regularization():
    model = FuzzyGatingFusion(num_classes=3, mode="full")
    img = jnp.zeros((2, 3))
    variables = model.init(KEY, img, img)
    reg = model.apply(variables, method=model.temperature_regularization)
    assert float(reg) == pytest.approx(0.0, abs=1e-6)  # init temps inside [0.5, 5]


# ---------------------------------------------------------------------------
# ViT fusion models
# ---------------------------------------------------------------------------

VIT_KW = dict(img_size=32, embed_dim=64, depth=2, num_heads=4)


@pytest.mark.parametrize("mode", ["concat", "add", "subtract", "subtract_abs", "multiply"])
def test_early_fusion_modes(mode):
    model = EarlyFusionViT(num_classes=3, fusion_mode=mode, **VIT_KW)
    img = jnp.zeros((2, 3, 32, 32))
    variables = model.init(KEY, img, img)
    logits = model.apply(variables, img, img)
    assert logits.shape == (2, 3)
    feats = model.apply(variables, img, img, return_features=True)
    assert feats.shape == (2, 64)


@pytest.mark.parametrize("mode,dim", [("concat", 128), ("add", 64), ("subtract", 64),
                                      ("multiply", 64), ("full", 256)])
def test_late_fusion_modes(mode, dim):
    model = LateFusionViT(num_classes=3, fusion_mode=mode, **VIT_KW)
    img = jnp.ones((2, 3, 32, 32))
    variables = model.init(KEY, img, img)
    logits = model.apply(variables, img, img)
    assert logits.shape == (2, 3)
    feats = model.apply(variables, img, img, return_features=True)
    assert feats["fused"].shape == (2, dim)


# ---------------------------------------------------------------------------
# ART
# ---------------------------------------------------------------------------

def test_art_forward_and_losses():
    cfg = ArtConfig(in_channels=C, out_channels=C, embedding_size=32,
                    num_encoder_layers=2, num_decoder_layers=2, num_heads=4,
                    feedforward_size=64, max_len=512)
    model = ArtifactRemovalTransformer(cfg)
    r = np.random.default_rng(4)
    src = jnp.asarray(r.normal(size=(B, C, 128)).astype(np.float32))
    tgt = jnp.asarray(r.normal(size=(B, C, 128)).astype(np.float32))
    variables = model.init(KEY, src, tgt)
    out = model.apply(variables, src, tgt)
    assert out.shape == (B, C, 128)
    l1 = art_loss(out, tgt, loss_zscore=False)
    l2 = art_loss(out, tgt, loss_zscore=True)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # tgt=None defaults to src (art.py:590-591).
    out2 = model.apply(variables, src)
    assert out2.shape == (B, C, 128)


# ---------------------------------------------------------------------------
# Multimodal composition
# ---------------------------------------------------------------------------

def test_multimodal_fusion_model():
    model = MultimodalFusionModel(
        img_size=32, vit_embed_dim=64, vit_depth=1, vit_num_heads=4,
        eeg_in_channels=C, eeg_d_model=32, eeg_num_layers=1, eeg_num_heads=4,
        eeg_d_ff=64, eeg_max_len=T // 4, use_spectrogram=False,
    )
    r = np.random.default_rng(5)
    img = jnp.asarray(r.normal(size=(B, 3, 32, 32)).astype(np.float32))
    e1, e2 = _eeg_pair()
    variables = model.init(KEY, img, img, e1, e2)
    out = model.apply(variables, img, img, e1, e2)
    assert out["logits"].shape == (B, 3)
    assert out["alpha"].shape == (B,)
    assert out["img_logits"].shape == (B, 3)
    assert out["eeg_logits"].shape == (B, 3)
    assert np.isfinite(np.asarray(out["logits"])).all()
