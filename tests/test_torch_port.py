"""Torch-checkpoint migration parity: reference state_dicts -> Flax.

The strongest possible proof for `eyegaze_tpu.models.torch_port`: import the
ACTUAL reference torch models from /root/reference (read-only), randomize
them, port their state_dicts, and require the Flax forward to reproduce the
torch forward — full DualEEGTransformer (including the connectivity, STFT,
instance-norm and cross-attention paths) and ArtifactRemovalTransformer.
Skipped when torch or the reference checkout is unavailable (the porters
themselves are pure array mapping and run anywhere).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from eyegaze_tpu.models.torch_port import (  # noqa: E402
    port_art_state_dict,
    port_dual_eeg_state_dict,
    port_gaze_early_state_dict,
    port_gaze_late_state_dict,
)

REF_BACKBONES = Path("/root/reference/3_Models/backbones")

B, C, T = 2, 8, 512
D_MODEL, LAYERS, HEADS, D_FF, MAX_LEN = 32, 2, 4, 64, 128


@pytest.fixture(scope="module")
def ref():
    """Import the reference torch model modules directly from the checkout."""
    if not REF_BACKBONES.exists():
        pytest.skip("reference checkout not mounted")
    sys.path.insert(0, str(REF_BACKBONES))
    try:
        import art as ref_art  # noqa: F401
        import dual_eeg_transformer as ref_dual  # noqa: F401
    finally:
        sys.path.remove(str(REF_BACKBONES))
    return ref_art, ref_dual


def _state_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _dual_eeg_pair(ref_dual, **flags):
    """Matching (torch model, flax model) at the small test geometry."""
    from eyegaze_tpu.models.dual_eeg import DualEEGTransformer

    torch.manual_seed(0)
    tm = ref_dual.DualEEGTransformer(
        in_channels=C, num_classes=3, d_model=D_MODEL, num_layers=LAYERS,
        num_heads=HEADS, d_ff=D_FF, dropout=0.1, max_len=MAX_LEN,
        conv_kernel_size=7, conv_stride=4, conv_layers=2, sampling_rate=256,
        **flags,
    ).eval()
    fm = DualEEGTransformer(
        in_channels=C, num_classes=3, d_model=D_MODEL, num_layers=LAYERS,
        num_heads=HEADS, d_ff=D_FF, max_len=MAX_LEN,
        conv_kernel_size=7, conv_stride=4, conv_layers=2, sampling_rate=256.0,
        use_spectrogram=flags.get("use_spectrogram", True),
        use_ibs=flags.get("use_ibs", True),
        use_robust_ibs=flags.get("use_robust_ibs", True),
        use_cross_attention=flags.get("use_cross_attention", True),
        ibs_instance_norm=flags.get("ibs_instance_norm", True),
        ibs_feature_type=flags.get("ibs_feature_type", "all"),
    )
    return tm, fm


def _port_and_compare(tm, fm):
    r = np.random.default_rng(7)
    e1 = r.normal(size=(B, C, T)).astype(np.float32)
    e2 = r.normal(size=(B, C, T)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(e1), torch.from_numpy(e2))["logits"].numpy()
    template = fm.init(jax.random.PRNGKey(0),
                       np.zeros((1, C, T), np.float32),
                       np.zeros((1, C, T), np.float32))["params"]
    params = port_dual_eeg_state_dict(template, _state_numpy(tm))
    got = np.asarray(fm.apply({"params": params}, e1, e2)["logits"])
    assert np.abs(want).max() > 1e-3  # non-degenerate fixture
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_dual_eeg_port_full_config(ref):
    """Flagship config: robust IBS + instance norm + spectrogram + cross-attn.
    The ported Flax forward must reproduce the reference torch forward."""
    _, ref_dual = ref
    tm, fm = _dual_eeg_pair(ref_dual)
    _port_and_compare(tm, fm)


def test_dual_eeg_port_scalar_ibs_no_cross(ref):
    """Ablation layout: legacy scalar IBS generator, no cross-attention —
    exercises the ibs_generator mapping and the absent-cross_attn branch."""
    _, ref_dual = ref
    tm, fm = _dual_eeg_pair(ref_dual, use_robust_ibs=False,
                            use_cross_attention=False)
    _port_and_compare(tm, fm)


@pytest.mark.parametrize("pos_mode", ["sinusoidal", "learned"])
def test_art_port_forward_parity(ref, pos_mode):
    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer

    ref_art, _ = ref
    t = 64
    torch.manual_seed(1)
    tm = ref_art.ArtifactRemovalTransformer(
        in_channels=C, out_channels=C, embedding_size=D_MODEL,
        num_encoder_layers=LAYERS, num_decoder_layers=LAYERS,
        num_heads=HEADS, feedforward_size=D_FF, dropout=0.1,
        max_len=t, pos_mode=pos_mode,
    ).eval()
    cfg = ArtConfig(in_channels=C, out_channels=C, embedding_size=D_MODEL,
                    num_encoder_layers=LAYERS, num_decoder_layers=LAYERS,
                    num_heads=HEADS, feedforward_size=D_FF, max_len=t,
                    pos_mode=pos_mode)
    fm = ArtifactRemovalTransformer(cfg)

    r = np.random.default_rng(11)
    src = r.normal(size=(B, C, t)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(src)).numpy()
    template = fm.init(jax.random.PRNGKey(0), src, src)["params"]
    params = port_art_state_dict(template, _state_numpy(tm))
    got = np.asarray(fm.apply({"params": params}, src, src))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_port_strictness_both_directions(ref):
    """A missing torch key and an extra torch key must both fail loudly."""
    ref_art, _ = ref
    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer

    torch.manual_seed(2)
    tm = ref_art.ArtifactRemovalTransformer(
        in_channels=C, out_channels=C, embedding_size=D_MODEL,
        num_encoder_layers=1, num_decoder_layers=1, num_heads=HEADS,
        feedforward_size=D_FF, max_len=32).eval()
    cfg = ArtConfig(in_channels=C, out_channels=C, embedding_size=D_MODEL,
                    num_encoder_layers=1, num_decoder_layers=1,
                    num_heads=HEADS, feedforward_size=D_FF, max_len=32)
    fm = ArtifactRemovalTransformer(cfg)
    x = np.zeros((1, C, 32), np.float32)
    template = fm.init(jax.random.PRNGKey(0), x, x)["params"]
    state = _state_numpy(tm)

    missing = dict(state)
    missing.pop("reconstructor.proj.weight")
    with pytest.raises(KeyError, match="reconstructor.proj.weight"):
        port_art_state_dict(template, missing)

    extra = dict(state)
    extra["reconstructor.extra_head.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        port_art_state_dict(template, extra)


def test_multimodal_port_forward_parity(ref):
    """Composite port: gaze_encoder.backbone (timm naming) + eeg_encoder
    (reference DualEEGTransformer) + fusion (reference FuzzyGatingFusion) —
    fused logits and the gate's alpha must match after porting."""
    import torch.nn as nn
    from test_vit_port import TorchViT

    from eyegaze_tpu.models.multimodal import MultimodalFusionModel
    from eyegaze_tpu.models.torch_port import port_multimodal_state_dict

    _, ref_dual = ref
    fusion_path = Path("/root/reference/3_Models/fusion")
    sys.path.insert(0, str(fusion_path))
    try:
        import fuzzy_gating_fusion as ref_fuzzy
    finally:
        sys.path.remove(str(fusion_path))

    s, embed = 32, 64
    torch.manual_seed(3)
    backbone = TorchViT(img=s, patch=16, embed=embed, depth=2, heads=4,
                        num_classes=3)
    backbone.patch_embed.proj = nn.Conv2d(6, embed, 16, 16)  # concat surgery
    eeg = ref_dual.DualEEGTransformer(
        in_channels=C, num_classes=3, d_model=D_MODEL, num_layers=LAYERS,
        num_heads=HEADS, d_ff=D_FF, dropout=0.1, max_len=MAX_LEN,
        sampling_rate=256)
    fusion = ref_fuzzy.FuzzyGatingFusion(num_classes=3)

    composite = nn.Module()
    composite.gaze_encoder = nn.Module()
    composite.gaze_encoder.backbone = backbone
    composite.eeg_encoder = eeg
    composite.fusion = fusion
    composite.eval()

    r = np.random.default_rng(31)
    i1 = r.normal(size=(B, 3, s, s)).astype(np.float32)
    i2 = r.normal(size=(B, 3, s, s)).astype(np.float32)
    e1 = r.normal(size=(B, C, T)).astype(np.float32)
    e2 = r.normal(size=(B, C, T)).astype(np.float32)
    with torch.no_grad():
        img_logits = backbone(torch.cat(
            [torch.from_numpy(i1), torch.from_numpy(i2)], 1))
        eeg_logits = eeg(torch.from_numpy(e1), torch.from_numpy(e2))["logits"]
        want_fused, want_alpha, _ = fusion(img_logits, eeg_logits)

    fm = MultimodalFusionModel(
        num_classes=3, gaze_fusion_mode="concat", eeg_in_channels=C,
        eeg_d_model=D_MODEL, eeg_num_layers=LAYERS, eeg_num_heads=HEADS,
        eeg_d_ff=D_FF, eeg_max_len=MAX_LEN, vit_embed_dim=embed, vit_depth=2,
        vit_num_heads=4, img_size=s)
    zi = np.zeros((1, 3, s, s), np.float32)
    ze = np.zeros((1, C, T), np.float32)
    template = fm.init(jax.random.PRNGKey(0), zi, zi, ze, ze)["params"]
    params = port_multimodal_state_dict(
        template, {k: v.detach().numpy() for k, v in
                   composite.state_dict().items()})
    out = fm.apply({"params": params}, i1, i2, e1, e2)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               want_fused.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]).squeeze(),
                               want_alpha.numpy().squeeze(),
                               rtol=2e-3, atol=2e-3)


def test_import_cli_multimodal(ref, tmp_path):
    """CLI path for the composite: sniffs kind=multimodal, ports all three
    submodules identically to port_multimodal_state_dict, stamps the
    constructor kwargs, and the stock MultimodalPredictor serves the result."""
    import os
    import subprocess

    import torch.nn as nn
    from test_vit_port import TorchViT

    from eyegaze_tpu.models.multimodal import MultimodalFusionModel
    from eyegaze_tpu.models.torch_port import port_multimodal_state_dict
    from eyegaze_tpu.serving import MultimodalPredictor

    _, ref_dual = ref
    fusion_path = Path("/root/reference/3_Models/fusion")
    sys.path.insert(0, str(fusion_path))
    try:
        import fuzzy_gating_fusion as ref_fuzzy
    finally:
        sys.path.remove(str(fusion_path))

    s, embed = 32, 64
    torch.manual_seed(9)
    backbone = TorchViT(img=s, patch=16, embed=embed, depth=2, heads=4,
                        num_classes=3)
    backbone.patch_embed.proj = nn.Conv2d(6, embed, 16, 16)
    composite = nn.Module()
    composite.gaze_encoder = nn.Module()
    composite.gaze_encoder.backbone = backbone
    composite.eeg_encoder = ref_dual.DualEEGTransformer(
        in_channels=C, num_classes=3, d_model=D_MODEL, num_layers=LAYERS,
        num_heads=HEADS, d_ff=D_FF, max_len=MAX_LEN, sampling_rate=256)
    composite.fusion = ref_fuzzy.FuzzyGatingFusion(num_classes=3)
    pt = tmp_path / "composite.pt"
    torch.save(composite.state_dict(), pt)

    root = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "scripts/import_torch_checkpoint.py", str(pt),
         "--out", str(tmp_path / "imp"), "--num-heads", str(HEADS)],
        cwd=root, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "kind=multimodal" in r.stdout

    # The CLI-written params must be exactly what the library porter gives.
    fm = MultimodalFusionModel(
        num_classes=3, gaze_fusion_mode="concat", eeg_in_channels=C,
        eeg_d_model=D_MODEL, eeg_num_layers=LAYERS, eeg_num_heads=HEADS,
        eeg_d_ff=D_FF, eeg_max_len=MAX_LEN, vit_embed_dim=embed, vit_depth=2,
        vit_num_heads=HEADS, img_size=s)
    zi = np.zeros((1, 3, s, s), np.float32)
    ze = np.zeros((1, C, T), np.float32)
    template = fm.init(jax.random.PRNGKey(0), zi, zi, ze, ze)["params"]
    want = port_multimodal_state_dict(
        template, {k: v.detach().numpy() for k, v in
                   composite.state_dict().items()})
    import orbax.checkpoint as ocp
    got = ocp.StandardCheckpointer().restore(
        (tmp_path / "imp" / "best_model").resolve())["params"]
    jax.tree_util.tree_map(np.testing.assert_array_equal, got,
                           jax.tree_util.tree_map(np.asarray, want))

    pred = MultimodalPredictor.from_checkpoint(tmp_path / "imp" / "best_model",
                                               batch_buckets=(2,))
    rr = np.random.default_rng(37)
    out = pred.predict(
        rr.integers(0, 255, size=(2, 3, s, s), dtype=np.uint8),
        rr.integers(0, 255, size=(2, 3, s, s), dtype=np.uint8),
        rr.normal(size=(2, C, T)).astype(np.float32),
        rr.normal(size=(2, C, T)).astype(np.float32))
    assert np.isfinite(out["logits"]).all()
    assert out["alpha"].shape[0] == 2


def test_import_cli_dual_eeg_to_serving(ref, tmp_path):
    """The full migration story: torch.save a reference DualEEGTransformer,
    run scripts/import_torch_checkpoint.py (kind sniffing + shape inference),
    and serve the result with the stock Predictor — predictions must match
    the torch model (bf16 serving compute => loose tolerance)."""
    import os
    import subprocess

    from eyegaze_tpu.serving import Predictor

    _, ref_dual = ref
    tm, _ = _dual_eeg_pair(ref_dual)
    pt = tmp_path / "reference_dual_eeg.pt"
    torch.save(tm.state_dict(), pt)

    root = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "scripts/import_torch_checkpoint.py", str(pt),
         "--out", str(tmp_path / "imported"), "--num-heads", str(HEADS)],
        cwd=root, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "kind=dual_eeg" in r.stdout

    rr = np.random.default_rng(29)
    e1 = rr.normal(size=(3, C, T)).astype(np.float32)
    e2 = rr.normal(size=(3, C, T)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(e1), torch.from_numpy(e2))["logits"].numpy()
    pred = Predictor.from_checkpoint(tmp_path / "imported" / "best_model",
                                     batch_buckets=(4,))
    got = pred.predict(e1, e2)
    np.testing.assert_allclose(got["logits"], want, rtol=5e-2, atol=5e-2)
    assert (np.argmax(got["logits"], -1) == np.argmax(want, -1)).all()


def _timm_style_state(prefix: str, *, in_ch: int, embed: int, depth: int,
                      patch: int, num_classes: int, n_tokens: int,
                      rng) -> dict:
    """Random timm-named state dict (the layout test_vit_port proves the
    transposes for), wrapped under the reference fusion wrapper's prefix."""
    s = {}
    p = f"{prefix}." if prefix else ""
    s[p + "patch_embed.proj.weight"] = rng.normal(
        size=(embed, in_ch, patch, patch)).astype(np.float32)
    s[p + "patch_embed.proj.bias"] = rng.normal(size=(embed,)).astype(np.float32)
    s[p + "cls_token"] = rng.normal(size=(1, 1, embed)).astype(np.float32)
    s[p + "pos_embed"] = rng.normal(size=(1, n_tokens, embed)).astype(np.float32)
    s[p + "norm.weight"] = np.ones(embed, np.float32)
    s[p + "norm.bias"] = np.zeros(embed, np.float32)
    for i in range(depth):
        b = f"{p}blocks.{i}."
        for ln in ("norm1", "norm2"):
            s[b + ln + ".weight"] = np.ones(embed, np.float32)
            s[b + ln + ".bias"] = np.zeros(embed, np.float32)
        s[b + "attn.qkv.weight"] = rng.normal(size=(3 * embed, embed)).astype(np.float32)
        s[b + "attn.qkv.bias"] = rng.normal(size=(3 * embed,)).astype(np.float32)
        s[b + "attn.proj.weight"] = rng.normal(size=(embed, embed)).astype(np.float32)
        s[b + "attn.proj.bias"] = rng.normal(size=(embed,)).astype(np.float32)
        s[b + "mlp.fc1.weight"] = rng.normal(size=(4 * embed, embed)).astype(np.float32)
        s[b + "mlp.fc1.bias"] = rng.normal(size=(4 * embed,)).astype(np.float32)
        s[b + "mlp.fc2.weight"] = rng.normal(size=(embed, 4 * embed)).astype(np.float32)
        s[b + "mlp.fc2.bias"] = rng.normal(size=(embed,)).astype(np.float32)
    if num_classes:
        s[p + "head.weight"] = rng.normal(size=(num_classes, embed)).astype(np.float32)
        s[p + "head.bias"] = rng.normal(size=(num_classes,)).astype(np.float32)
    return s


def test_gaze_early_port_concat_6ch():
    """EarlyFusionViT concat checkpoints carry a trained 6-channel patch
    embed under 'backbone.' — the port must take it verbatim (no widening)."""
    from eyegaze_tpu.models.vit import EarlyFusionViT

    rng = np.random.default_rng(3)
    s, patch, embed, depth = 32, 16, 64, 2  # wrapper pins timm's patch16
    n_tok = (s // patch) ** 2 + 1
    model = EarlyFusionViT(num_classes=3, img_size=s, fusion_mode="concat",
                           embed_dim=embed, depth=depth, num_heads=4)
    z = np.zeros((1, 3, s, s), np.float32)
    template = model.init(jax.random.PRNGKey(0), z, z)["params"]
    state = _timm_style_state("backbone", in_ch=6, embed=embed, depth=depth,
                              patch=patch, num_classes=3, n_tokens=n_tok,
                              rng=rng)
    params = jax.tree_util.tree_map(
        np.asarray, port_gaze_early_state_dict(template, state))
    np.testing.assert_array_equal(
        params["backbone"]["patch_embed"]["kernel"],
        np.transpose(state["backbone.patch_embed.proj.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        params["backbone"]["head"]["kernel"],
        state["backbone.head.weight"].T)


def test_gaze_late_port_classifier():
    """LateFusionViT: headless timm encoder under 'encoder.' + root
    classifier Linear; fusion_mode dim mismatches must fail loudly."""
    from eyegaze_tpu.models.vit import LateFusionViT

    rng = np.random.default_rng(5)
    s, patch, embed, depth = 32, 16, 64, 2  # wrapper pins timm's patch16
    n_tok = (s // patch) ** 2 + 1
    model = LateFusionViT(num_classes=3, img_size=s, fusion_mode="concat",
                          embed_dim=embed, depth=depth, num_heads=4)
    z = np.zeros((1, 3, s, s), np.float32)
    template = model.init(jax.random.PRNGKey(0), z, z)["params"]
    state = _timm_style_state("encoder", in_ch=3, embed=embed, depth=depth,
                              patch=patch, num_classes=0, n_tokens=n_tok,
                              rng=rng)
    state["classifier.weight"] = rng.normal(size=(3, 2 * embed)).astype(np.float32)
    state["classifier.bias"] = rng.normal(size=(3,)).astype(np.float32)
    params = jax.tree_util.tree_map(
        np.asarray, port_gaze_late_state_dict(template, state))
    np.testing.assert_array_equal(params["classifier"]["kernel"],
                                  state["classifier.weight"].T)

    bad = dict(state)
    bad["classifier.weight"] = rng.normal(size=(3, embed)).astype(np.float32)
    with pytest.raises(ValueError, match="fusion_mode"):
        port_gaze_late_state_dict(template, bad)


def _param_only(state: dict) -> dict:
    from eyegaze_tpu.models.torch_port import _is_buffer

    return {k: np.asarray(v) for k, v in state.items() if not _is_buffer(k)}


def test_export_roundtrip_dual_eeg(ref):
    """export(port(state)) must reproduce the torch state_dict exactly —
    every parameter key, every value, both ablation layouts."""
    from eyegaze_tpu.models.torch_port import (export_dual_eeg_state_dict,
                                               port_dual_eeg_state_dict)

    _, ref_dual = ref
    for flags in ({}, {"use_robust_ibs": False, "use_cross_attention": False}):
        tm, fm = _dual_eeg_pair(ref_dual, **flags)
        state = _param_only(_state_numpy(tm))
        template = fm.init(jax.random.PRNGKey(0),
                           np.zeros((1, C, T), np.float32),
                           np.zeros((1, C, T), np.float32))["params"]
        back = export_dual_eeg_state_dict(
            port_dual_eeg_state_dict(template, state))
        assert set(back) == set(state)
        for k in state:
            np.testing.assert_array_equal(back[k], state[k], err_msg=k)


def test_export_roundtrip_art(ref):
    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer
    from eyegaze_tpu.models.torch_port import (export_art_state_dict,
                                               port_art_state_dict)

    ref_art, _ = ref
    torch.manual_seed(21)
    tm = ref_art.ArtifactRemovalTransformer(
        in_channels=C, out_channels=C, embedding_size=D_MODEL,
        num_encoder_layers=LAYERS, num_decoder_layers=LAYERS,
        num_heads=HEADS, feedforward_size=D_FF, max_len=64,
        pos_mode="learned").eval()
    cfg = ArtConfig(in_channels=C, out_channels=C, embedding_size=D_MODEL,
                    num_encoder_layers=LAYERS, num_decoder_layers=LAYERS,
                    num_heads=HEADS, feedforward_size=D_FF, max_len=64,
                    pos_mode="learned")
    fm = ArtifactRemovalTransformer(cfg)
    x = np.zeros((1, C, 64), np.float32)
    template = fm.init(jax.random.PRNGKey(0), x, x)["params"]
    state = _param_only(_state_numpy(tm))
    back = export_art_state_dict(port_art_state_dict(template, state))
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k], err_msg=k)


def test_export_roundtrip_gaze_and_multimodal(ref):
    """timm-backbone exports invert the qkv re-fusion and patch-embed
    transposes exactly; the composite re-assembles all three prefixes."""
    import torch.nn as nn
    from test_vit_port import TorchViT

    from eyegaze_tpu.models.multimodal import MultimodalFusionModel
    from eyegaze_tpu.models.torch_port import (export_gaze_late_state_dict,
                                               export_multimodal_state_dict,
                                               port_gaze_late_state_dict,
                                               port_multimodal_state_dict)
    from eyegaze_tpu.models.vit import LateFusionViT

    _, ref_dual = ref
    fusion_path = Path("/root/reference/3_Models/fusion")
    sys.path.insert(0, str(fusion_path))
    try:
        import fuzzy_gating_fusion as ref_fuzzy
    finally:
        sys.path.remove(str(fusion_path))

    s, embed = 32, 64
    rng = np.random.default_rng(61)
    # late-fusion roundtrip (headless encoder + root classifier)
    n_tok = (s // 16) ** 2 + 1
    late_state = _timm_style_state("encoder", in_ch=3, embed=embed, depth=2,
                                   patch=16, num_classes=0, n_tokens=n_tok,
                                   rng=rng)
    late_state["classifier.weight"] = rng.normal(
        size=(3, 2 * embed)).astype(np.float32)
    late_state["classifier.bias"] = rng.normal(size=(3,)).astype(np.float32)
    lm = LateFusionViT(num_classes=3, img_size=s, fusion_mode="concat",
                       embed_dim=embed, depth=2, num_heads=4)
    z = np.zeros((1, 3, s, s), np.float32)
    template = lm.init(jax.random.PRNGKey(0), z, z)["params"]
    back = export_gaze_late_state_dict(
        port_gaze_late_state_dict(template, late_state))
    assert set(back) == set(late_state)
    for k in late_state:
        np.testing.assert_array_equal(back[k], late_state[k], err_msg=k)

    # multimodal composite roundtrip
    torch.manual_seed(31)
    backbone = TorchViT(img=s, patch=16, embed=embed, depth=2, heads=4,
                        num_classes=3)
    backbone.patch_embed.proj = nn.Conv2d(6, embed, 16, 16)
    composite = nn.Module()
    composite.gaze_encoder = nn.Module()
    composite.gaze_encoder.backbone = backbone
    composite.eeg_encoder = ref_dual.DualEEGTransformer(
        in_channels=C, num_classes=3, d_model=D_MODEL, num_layers=LAYERS,
        num_heads=HEADS, d_ff=D_FF, max_len=MAX_LEN, sampling_rate=256)
    composite.fusion = ref_fuzzy.FuzzyGatingFusion(num_classes=3)
    mm_state = _param_only(_state_numpy(composite))
    mm_state.pop("fusion.c_reliable", None)  # buffer (constant 0.0)
    fm = MultimodalFusionModel(
        num_classes=3, gaze_fusion_mode="concat", eeg_in_channels=C,
        eeg_d_model=D_MODEL, eeg_num_layers=LAYERS, eeg_num_heads=HEADS,
        eeg_d_ff=D_FF, eeg_max_len=MAX_LEN, vit_embed_dim=embed, vit_depth=2,
        vit_num_heads=4, img_size=s)
    zi = np.zeros((1, 3, s, s), np.float32)
    ze = np.zeros((1, C, T), np.float32)
    template = fm.init(jax.random.PRNGKey(0), zi, zi, ze, ze)["params"]
    back = export_multimodal_state_dict(
        port_multimodal_state_dict(template, mm_state))
    assert set(back) == set(mm_state)
    for k in mm_state:
        np.testing.assert_array_equal(back[k], mm_state[k], err_msg=k)


def test_export_cli_roundtrip(ref, tmp_path):
    """Both CLIs end to end: torch .pt -> import -> orbax -> export -> .pt;
    the final state_dict equals the original, and the reference torch model
    loads it (strict=False covers only its deterministic buffers)."""
    import os
    import subprocess

    _, ref_dual = ref
    tm, _ = _dual_eeg_pair(ref_dual)
    pt = tmp_path / "orig.pt"
    torch.save(tm.state_dict(), pt)
    root = Path(__file__).resolve().parent.parent
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "scripts/import_torch_checkpoint.py", str(pt),
         "--out", str(tmp_path / "imp"), "--num-heads", str(HEADS)],
        cwd=root, capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "scripts/export_torch_checkpoint.py",
         str(tmp_path / "imp" / "best_model"),
         "--out", str(tmp_path / "back.pt")],
        cwd=root, capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "kind=dual_eeg" in r.stdout

    back = torch.load(tmp_path / "back.pt", map_location="cpu",
                      weights_only=True)
    orig = _param_only(_state_numpy(tm))
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(back[k].numpy(), orig[k], err_msg=k)
    missing, unexpected = tm.load_state_dict(
        {k: v for k, v in back.items()}, strict=False)
    assert not unexpected
    assert all(k.endswith((".pe", "window")) for k in missing)
