"""Serving predictor tests: checkpoint roundtrip, bucketed batching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
from eyegaze_tpu.serving import Predictor
from eyegaze_tpu.train.checkpoint import CheckpointManager
from eyegaze_tpu.train.optim import make_optimizer
from eyegaze_tpu.train.state import create_train_state

C, T = 8, 256
MODEL_CFG = {
    "model": {"in_channels": C, "num_labels": 3, "d_model": 32, "num_layers": 1,
              "num_heads": 4, "d_ff": 64},
    "ablation": {"use_spectrogram": False, "use_ibs": True, "ibs_mode": "robust",
                 "use_cross_attention": True, "ibs_instance_norm": True,
                 "ibs_feature_type": "all"},
    "data": {"window_size": T, "sampling_rate": 256.0},
}


def test_predictor_from_checkpoint(tmp_path):
    model = DualEEGTransformer(in_channels=C, d_model=32, num_layers=1,
                               num_heads=4, d_ff=64, max_len=128,
                               use_spectrogram=False)
    r = np.random.default_rng(0)
    e = jnp.asarray(r.normal(size=(1, C, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), e, e)
    tx = make_optimizer(1e-3)
    state = create_train_state(model, variables, tx)
    cm = CheckpointManager(tmp_path)
    cm.save_if_best(0.9, state, config=MODEL_CFG)

    pred = Predictor.from_checkpoint(tmp_path / "best_model",
                                     batch_buckets=(2, 4))
    # Ragged batch of 5 -> chunks of 4 (bucket) + 1 (padded to 2).
    e1 = r.normal(size=(5, C, T)).astype(np.float32)
    e2 = r.normal(size=(5, C, T)).astype(np.float32)
    out = pred.predict(e1, e2)
    assert out["logits"].shape == (5, 3)
    assert out["preds"].shape == (5,)
    assert len(out["labels"]) == 5
    np.testing.assert_allclose(out["probs"].sum(axis=1), 1.0, atol=1e-5)

    # Padding must not change the un-padded samples' outputs.
    out_single = pred.predict(e1[:1], e2[:1])
    np.testing.assert_allclose(out_single["logits"][0], out["logits"][0],
                               rtol=1e-4, atol=1e-4)


def test_predictor_mesh_serving_matches_single_device(tmp_path):
    """Multi-chip serving: mesh='dp' shards request batches over the 8-device
    virtual mesh, 'dp4,tp2' also shards the transformer matmuls — both must
    reproduce the single-device logits bit-for-tolerance."""
    from jax.sharding import PartitionSpec as P

    model = DualEEGTransformer(in_channels=C, d_model=32, num_layers=1,
                               num_heads=4, d_ff=64, max_len=128,
                               use_spectrogram=False)
    r = np.random.default_rng(11)
    e = jnp.asarray(r.normal(size=(1, C, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), e, e)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    CheckpointManager(tmp_path).save_if_best(0.9, state, config=MODEL_CFG)
    ckpt = tmp_path / "best_model"

    e1 = r.normal(size=(5, C, T)).astype(np.float32)
    e2 = r.normal(size=(5, C, T)).astype(np.float32)
    ref = Predictor.from_checkpoint(ckpt, batch_buckets=(2, 4)).predict(e1, e2)

    dp = Predictor.from_checkpoint(ckpt, batch_buckets=(2, 4), mesh="dp")
    assert dp.buckets == (8,)  # buckets round up to the data-axis size
    out = dp.predict(e1, e2)
    np.testing.assert_allclose(out["logits"], ref["logits"], rtol=1e-4, atol=1e-4)
    # The padded request batch must actually shard over all 8 devices.
    sharded = dp._put(np.zeros((8, C, T), np.float32))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape[0] == 1

    tp = Predictor.from_checkpoint(ckpt, batch_buckets=(4,), mesh="dp4,tp2")
    qk = tp.params["encoder"]["layer_0"]["mha"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, "model")
    out_tp = tp.predict(e1, e2)
    # Serving models run bf16: TP changes the matmul reduction order, so
    # agreement is at bf16 resolution (~1e-2), not exact like the DP path.
    np.testing.assert_allclose(out_tp["logits"], ref["logits"],
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kind", ["early", "late"])
def test_gaze_predictor_from_checkpoint(tmp_path, kind):
    """Gaze serving: uint8 in, on-device norm, meta-driven reconstruction
    (VERDICT r2 #8)."""
    from eyegaze_tpu.data.image_fusion import imagenet_normalize, to_unit_float
    from eyegaze_tpu.models.vit import EarlyFusionViT, LateFusionViT
    from eyegaze_tpu.serving import GazePredictor

    s = 32
    kw = dict(num_classes=3, img_size=s, fusion_mode="concat",
              embed_dim=64, depth=2, num_heads=4)
    model = EarlyFusionViT(**kw) if kind == "early" else LateFusionViT(**kw)
    r = np.random.default_rng(1)
    z = jnp.zeros((1, 3, s, s), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    cm = CheckpointManager(tmp_path)
    cm.save_if_best(0.5, state, config={
        "model": {"kind": kind, "img_size": s, "fusion_mode": "concat",
                  "num_labels": 3}})

    pred = GazePredictor.from_checkpoint(tmp_path / "best_model",
                                         batch_buckets=(2, 4))
    img1 = r.integers(0, 255, size=(3, 3, s, s), dtype=np.uint8)
    img2 = r.integers(0, 255, size=(3, 3, s, s), dtype=np.uint8)
    out = pred.predict(img1, img2)
    assert out["logits"].shape == (3, 3)
    assert len(out["labels"]) == 3
    np.testing.assert_allclose(out["probs"].sum(axis=1), 1.0, atol=1e-5)

    # The predictor's on-device normalization must match the host-side
    # reference transform applied to the same uint8 pixels.
    ref_logits = np.asarray(model.apply(
        {"params": pred.params},
        imagenet_normalize(to_unit_float(jnp.asarray(img1))),
        imagenet_normalize(to_unit_float(jnp.asarray(img2)))))
    np.testing.assert_allclose(out["logits"], ref_logits, rtol=2e-2, atol=2e-2)


def test_gaze_predictor_datafusion_checkpoint(tmp_path):
    """Datafusion serving: the pair is fused in image space on device with
    the meta-stamped fusion op + normalization (two_image_fusion.py:85-150
    DualImageDataset contract), then a plain 3-channel ViT."""
    from eyegaze_tpu.data.image_fusion import (fuse_image_pair,
                                               resize_bilinear, to_unit_float,
                                               vit_processor_normalize)
    from eyegaze_tpu.models.vit import VisionTransformer
    from eyegaze_tpu.serving import GazePredictor

    s = 32
    model = VisionTransformer(num_classes=3, img_size=s, embed_dim=64,
                              depth=2, num_heads=4)
    r = np.random.default_rng(3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, s, s), jnp.float32))
    state = create_train_state(model, variables, make_optimizer(1e-3))
    cm = CheckpointManager(tmp_path)
    cm.save_if_best(0.5, state, config={
        "model": {"kind": "datafusion", "img_size": s, "num_labels": 3,
                  "vit_num_heads": 4, "data_fusion_mode": "horizontal",
                  "image_norm": "vit"}})

    pred = GazePredictor.from_checkpoint(tmp_path / "best_model",
                                         batch_buckets=(2, 4))
    img1 = r.integers(0, 255, size=(3, 3, s, s), dtype=np.uint8)
    img2 = r.integers(0, 255, size=(3, 3, s, s), dtype=np.uint8)
    out = pred.predict(img1, img2)
    assert out["logits"].shape == (3, 3)

    # On-device fuse + norm must match the host-side reference transform.
    fused = fuse_image_pair(to_unit_float(jnp.asarray(img1)),
                            to_unit_float(jnp.asarray(img2)), "horizontal")
    fused = resize_bilinear(fused, s, s)
    ref_logits = np.asarray(model.apply({"params": pred.params},
                                        vit_processor_normalize(fused)))
    np.testing.assert_allclose(out["logits"], ref_logits, rtol=2e-2, atol=2e-2)


def test_gaze_predictor_rejects_unknown_kind(tmp_path):
    """A clear error (not a bare TypeError) for unsupported kinds."""
    from eyegaze_tpu.models.vit import EarlyFusionViT
    from eyegaze_tpu.serving import GazePredictor

    s = 32
    model = EarlyFusionViT(num_classes=3, img_size=s, fusion_mode="concat",
                           embed_dim=64, depth=2, num_heads=4)
    z = jnp.zeros((1, 3, s, s), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    cm = CheckpointManager(tmp_path)
    cm.save_if_best(0.5, state, config={"model": {"kind": "early", "img_size": s}})
    with pytest.raises(ValueError, match="unsupported gaze model kind"):
        GazePredictor.from_checkpoint(tmp_path / "best_model", kind="siamese")


def test_art_denoiser_from_checkpoint(tmp_path):
    """ART serving: label-free denoising (tgt = src), meta-driven
    architecture reconstruction, bucketed ragged batching."""
    import dataclasses

    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer
    from eyegaze_tpu.serving import ArtDenoiser

    cfg = ArtConfig(in_channels=C, out_channels=C, embedding_size=32,
                    num_encoder_layers=1, num_decoder_layers=1, num_heads=4,
                    feedforward_size=64, max_len=T)
    model = ArtifactRemovalTransformer(cfg)
    r = np.random.default_rng(2)
    x = jnp.asarray(r.normal(size=(1, C, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    cm = CheckpointManager(tmp_path, metric_greater_is_better=False)
    cm.save_if_best(0.9, state, config={"model": dataclasses.asdict(cfg)})

    den = ArtDenoiser.from_checkpoint(tmp_path / "best_model",
                                      batch_buckets=(2, 4))
    # warmup must clamp its default T to the checkpoint's max_len (256 here);
    # an unconditional 1024 would break positional-table broadcasting.
    den.warmup()
    noisy = r.normal(size=(5, C, T)).astype(np.float32)
    out = den.predict(noisy)
    assert out["denoised"].shape == (5, C, T)
    assert np.isfinite(out["denoised"]).all()

    # Serving forward (tgt defaults to src) must match a direct model call
    # on the same params; padding must not leak into real samples.
    ref = np.asarray(den.model.apply({"params": den.params},
                                     jnp.asarray(noisy[:1])))
    np.testing.assert_allclose(out["denoised"][:1], ref, rtol=2e-2, atol=2e-2)


def _tiny_multimodal():
    from eyegaze_tpu.models.multimodal import MultimodalFusionModel

    return MultimodalFusionModel(
        num_classes=3, gaze_fusion_mode="concat", fuzzy_mode="full",
        eeg_in_channels=C, eeg_d_model=32, eeg_num_layers=1, eeg_num_heads=4,
        eeg_d_ff=64, eeg_max_len=128, use_spectrogram=False,
        vit_embed_dim=64, vit_depth=2, vit_num_heads=4, img_size=32)


def _save_multimodal_ckpt(tmp_path, stamp: bool):
    import dataclasses

    model = _tiny_multimodal()
    s = model.img_size
    zi = jnp.zeros((1, 3, s, s), jnp.float32)
    ze = jnp.zeros((1, C, 4 * model.eeg_max_len), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), zi, zi, ze, ze)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    mc = {"num_labels": 3, "img_size": s, "fusion_mode": "concat",
          "fuzzy_mode": "full", "in_channels": C, "num_heads": 4,
          "vit_num_heads": 4}
    if stamp:
        mc["multimodal"] = {
            f.name: getattr(model, f.name)
            for f in dataclasses.fields(type(model))
            if f.name not in ("parent", "name", "dtype")}
    CheckpointManager(tmp_path).save_if_best(0.5, state, config={"model": mc})
    return model


@pytest.mark.parametrize("stamp", [True, False], ids=["stamped", "inferred"])
def test_multimodal_predictor_from_checkpoint(tmp_path, stamp):
    """Multimodal composite serving: uint8 images + raw EEG in one dispatch,
    fused/per-modality logits + fuzzy alpha out; reconstruction from the
    stamped constructor (train_multimodal.py) or param-shape inference."""
    from eyegaze_tpu.data.image_fusion import imagenet_normalize, to_unit_float
    from eyegaze_tpu.serving import MultimodalPredictor

    model = _save_multimodal_ckpt(tmp_path, stamp)
    s, t = model.img_size, 4 * model.eeg_max_len
    pred = MultimodalPredictor.from_checkpoint(tmp_path / "best_model",
                                               batch_buckets=(2, 4))
    # Reconstruction must reproduce the exact architecture either way
    # (serving always builds bf16, so compare every field except dtype).
    import dataclasses

    for f in dataclasses.fields(type(model)):
        if f.name in ("parent", "name", "dtype"):
            continue
        assert getattr(pred.model, f.name) == getattr(model, f.name), f.name

    r = np.random.default_rng(5)
    img1 = r.integers(0, 255, size=(5, 3, s, s), dtype=np.uint8)
    img2 = r.integers(0, 255, size=(5, 3, s, s), dtype=np.uint8)
    eeg1 = r.normal(size=(5, C, t)).astype(np.float32)
    eeg2 = r.normal(size=(5, C, t)).astype(np.float32)
    out = pred.predict(img1, img2, eeg1, eeg2)
    assert out["logits"].shape == (5, 3)
    assert out["img_logits"].shape == (5, 3)
    assert out["eeg_logits"].shape == (5, 3)
    assert out["alpha"].shape[0] == 5
    assert len(out["labels"]) == 5
    np.testing.assert_allclose(out["probs"].sum(axis=1), 1.0, atol=1e-5)

    # On-device image prep + composite forward must match the host-side
    # reference transform on the same bytes; ragged batching (5 -> 4 + pad-to-2)
    # must not leak padding into real rows.
    ref = model.apply(
        {"params": pred.params},
        imagenet_normalize(to_unit_float(jnp.asarray(img1))),
        imagenet_normalize(to_unit_float(jnp.asarray(img2))),
        jnp.asarray(eeg1), jnp.asarray(eeg2))
    np.testing.assert_allclose(out["logits"], np.asarray(ref["logits"]),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(out["alpha"], np.asarray(ref["alpha"]),
                               rtol=2e-2, atol=2e-2)


def test_gaze_predictor_mesh_serving_matches_single_device(tmp_path):
    """Mesh DP serving for the gaze family: uint8 pixels must flow through
    the sharded device_put and reproduce the single-device logits."""
    from eyegaze_tpu.models.vit import EarlyFusionViT
    from eyegaze_tpu.serving import GazePredictor

    s = 32
    model = EarlyFusionViT(num_classes=3, img_size=s, fusion_mode="concat",
                           embed_dim=64, depth=2, num_heads=4)
    z = jnp.zeros((1, 3, s, s), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    CheckpointManager(tmp_path).save_if_best(0.5, state, config={
        "model": {"kind": "early", "img_size": s, "fusion_mode": "concat",
                  "num_labels": 3}})
    ckpt = tmp_path / "best_model"

    r = np.random.default_rng(13)
    img1 = r.integers(0, 255, size=(3, 3, s, s), dtype=np.uint8)
    img2 = r.integers(0, 255, size=(3, 3, s, s), dtype=np.uint8)
    ref = GazePredictor.from_checkpoint(ckpt, batch_buckets=(4,)).predict(
        img1, img2)
    dp = GazePredictor.from_checkpoint(ckpt, batch_buckets=(4,), mesh="dp")
    assert dp.buckets == (8,)  # rounds up to the data-axis size
    out = dp.predict(img1, img2)
    np.testing.assert_allclose(out["logits"], ref["logits"],
                               rtol=1e-4, atol=1e-4)
    sharded = dp._put(np.zeros((8, 3, s, s), np.uint8))
    assert len(sharded.addressable_shards) == 8


def test_art_denoiser_mesh_serving_matches_single_device(tmp_path):
    """Mesh DP serving for ART (recon_zscore=None): padded-bucket execution
    on the 8-device mesh must reproduce the single-device denoised output."""
    import dataclasses

    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer
    from eyegaze_tpu.serving import ArtDenoiser

    cfg = ArtConfig(in_channels=C, out_channels=C, embedding_size=32,
                    num_encoder_layers=1, num_decoder_layers=1, num_heads=4,
                    feedforward_size=64, max_len=T)
    model = ArtifactRemovalTransformer(cfg)
    r = np.random.default_rng(17)
    x = jnp.asarray(r.normal(size=(1, C, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    CheckpointManager(tmp_path, metric_greater_is_better=False).save_if_best(
        0.9, state, config={"model": dataclasses.asdict(cfg)})
    ckpt = tmp_path / "best_model"

    noisy = r.normal(size=(3, C, T)).astype(np.float32)
    ref = ArtDenoiser.from_checkpoint(ckpt, batch_buckets=(4,)).predict(noisy)
    dp = ArtDenoiser.from_checkpoint(ckpt, batch_buckets=(4,), mesh="dp")
    assert dp.buckets == (8,)
    out = dp.predict(noisy)
    np.testing.assert_allclose(out["denoised"], ref["denoised"],
                               rtol=1e-4, atol=1e-4)


def test_art_denoiser_batch_zscore_forces_per_sample(tmp_path):
    """recon_zscore='batch' heads normalize over the batch axis: the
    denoiser must force per-sample buckets even when a caller (e.g.
    scripts/serve.py) passes explicit batch_buckets, and must refuse a
    data-parallel mesh whose bucket rounding would re-introduce padding."""
    import dataclasses

    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer
    from eyegaze_tpu.serving import ArtDenoiser

    cfg = ArtConfig(in_channels=C, out_channels=C, embedding_size=32,
                    num_encoder_layers=1, num_decoder_layers=1, num_heads=4,
                    feedforward_size=64, max_len=T, recon_zscore="batch")
    model = ArtifactRemovalTransformer(cfg)
    r = np.random.default_rng(19)
    x = jnp.asarray(r.normal(size=(1, C, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    CheckpointManager(tmp_path, metric_greater_is_better=False).save_if_best(
        0.9, state, config={"model": dataclasses.asdict(cfg)})
    ckpt = tmp_path / "best_model"

    den = ArtDenoiser.from_checkpoint(ckpt, batch_buckets=(2, 4))
    assert den.buckets == (1,)  # explicit kwarg must not defeat the invariant
    noisy = r.normal(size=(3, C, T)).astype(np.float32)
    out = den.predict(noisy)
    # Request-composition invariance: each sample alone gives the same rows.
    single = den.predict(noisy[1:2])
    np.testing.assert_allclose(out["denoised"][1:2], single["denoised"],
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="per-sample"):
        ArtDenoiser.from_checkpoint(ckpt, mesh="dp")


def test_multimodal_predictor_mesh_serving_matches_single_device(tmp_path):
    """Mesh DP serving for the multimodal composite: all four input arrays
    flow through the sharded put and reproduce single-device outputs."""
    from eyegaze_tpu.serving import MultimodalPredictor

    model = _save_multimodal_ckpt(tmp_path, stamp=True)
    s, t = model.img_size, 4 * model.eeg_max_len
    ckpt = tmp_path / "best_model"
    r = np.random.default_rng(23)
    img1 = r.integers(0, 255, size=(3, 3, s, s), dtype=np.uint8)
    img2 = r.integers(0, 255, size=(3, 3, s, s), dtype=np.uint8)
    eeg1 = r.normal(size=(3, C, t)).astype(np.float32)
    eeg2 = r.normal(size=(3, C, t)).astype(np.float32)

    ref = MultimodalPredictor.from_checkpoint(ckpt, batch_buckets=(4,)).predict(
        img1, img2, eeg1, eeg2)
    dp = MultimodalPredictor.from_checkpoint(ckpt, batch_buckets=(4,),
                                             mesh="dp")
    assert dp.buckets == (8,)
    out = dp.predict(img1, img2, eeg1, eeg2)
    np.testing.assert_allclose(out["logits"], ref["logits"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out["alpha"], ref["alpha"],
                               rtol=1e-4, atol=1e-4)


def test_http_serving_cli(tmp_path):
    """scripts/serve.py end-to-end over a real socket: kind sniffing, health/
    info, npz-in/JSON-out predict, npz-out round-trip, 400 on bad input."""
    import importlib.util
    import io
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from pathlib import Path as P

    # A tiny EEG flagship checkpoint (same recipe as the Predictor test).
    model = DualEEGTransformer(in_channels=C, d_model=32, num_layers=1,
                               num_heads=4, d_ff=64, max_len=128,
                               use_spectrogram=False)
    r = np.random.default_rng(7)
    e = jnp.asarray(r.normal(size=(1, C, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), e, e)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    CheckpointManager(tmp_path).save_if_best(0.9, state, config=MODEL_CFG)
    ckpt = tmp_path / "best_model"

    root = P(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "serve_cli", root / "scripts" / "serve.py")
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    kind = serve.sniff_kind(ckpt)
    assert kind == "eeg"
    predictor = serve.build_predictor(kind, ckpt, (2, 4))
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(kind, predictor, ckpt))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
            assert _json.load(resp)["status"] == "ok"
        with urllib.request.urlopen(f"{base}/info", timeout=30) as resp:
            info = _json.load(resp)
        assert info["kind"] == "eeg" and info["inputs"] == ["eeg1", "eeg2"]

        def post(path, body):
            req = urllib.request.Request(f"{base}{path}", data=body,
                                         method="POST")
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    return resp.status, resp.read()
            except urllib.error.HTTPError as err:
                return err.code, err.read()

        buf = io.BytesIO()
        np.savez(buf, eeg1=r.normal(size=(3, C, T)).astype(np.float32),
                 eeg2=r.normal(size=(3, C, T)).astype(np.float32))
        status, body = post("/predict", buf.getvalue())
        assert status == 200
        out = _json.loads(body)
        assert np.shape(out["logits"]) == (3, 3)
        assert len(out["labels"]) == 3

        status, body = post("/predict?format=npz", buf.getvalue())
        assert status == 200
        npz = np.load(io.BytesIO(body))
        np.testing.assert_allclose(npz["logits"], out["logits"], rtol=1e-5)

        bad = io.BytesIO()
        np.savez(bad, eeg1=np.zeros((1, C, T), np.float32))  # eeg2 missing
        status, body = post("/predict", bad.getvalue())
        assert status == 400 and b"missing input arrays" in body
        status, body = post("/predict", b"not an npz archive")
        assert status == 400
        # 0-d arrays are a valid npz but not batchable: must 400, not drop
        # the connection (len() of a 0-d array raises TypeError).
        scalars = io.BytesIO()
        np.savez(scalars, eeg1=np.float32(1.0), eeg2=np.float32(2.0))
        status, body = post("/predict", scalars.getvalue())
        assert status == 400 and b"scalar" in body
        # Mis-shaped inputs 400 BEFORE a dispatch attempt, pointing at /info's
        # input_spec (channel count read off the restored model).
        assert info["input_spec"]["eeg1"] == ["N", C, "T"]
        badshape = io.BytesIO()
        np.savez(badshape, eeg1=np.zeros((1, C + 1, T), np.float32),
                 eeg2=np.zeros((1, C + 1, T), np.float32))
        status, body = post("/predict", badshape.getvalue())
        assert status == 400 and b"does not match expected" in body
        # /metrics: latency percentiles over served requests, errors counted.
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as resp:
            metrics = _json.load(resp)
        assert metrics["requests"] > 0 and metrics["errors"] == 0
        assert "latency_p50_ms" in metrics and "latency_p99_ms" in metrics
    finally:
        server.shutdown()
        server.server_close()


def _tiny_eeg_predictor(tmp_path, buckets=(2, 8)):
    model = DualEEGTransformer(in_channels=C, d_model=32, num_layers=1,
                               num_heads=4, d_ff=64, max_len=128,
                               use_spectrogram=False)
    r = np.random.default_rng(41)
    e = jnp.asarray(r.normal(size=(1, C, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), e, e)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    CheckpointManager(tmp_path).save_if_best(0.9, state, config=MODEL_CFG)
    return Predictor.from_checkpoint(tmp_path / "best_model",
                                     batch_buckets=buckets)


def test_dynamic_batcher_coalesces_and_matches(tmp_path):
    """Concurrent predict() calls must return exactly the rows a direct
    predict would, and co-arriving requests must share device dispatches."""
    import threading

    from eyegaze_tpu.serving import DynamicBatcher

    pred = _tiny_eeg_predictor(tmp_path)
    r = np.random.default_rng(43)
    e1 = r.normal(size=(6, C, T)).astype(np.float32)
    e2 = r.normal(size=(6, C, T)).astype(np.float32)
    want = pred.predict(e1, e2)
    pred.predict(e1[:2], e2[:2])  # pre-compile both buckets

    batcher = DynamicBatcher(pred, max_wait_ms=200.0)
    try:
        outs = [None] * 6

        def one(i):
            outs[i] = batcher.predict(e1[i:i + 1], e2[i:i + 1])

        threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i, out in enumerate(outs):
            assert out is not None, f"request {i} never completed"
            np.testing.assert_allclose(out["logits"], want["logits"][i:i + 1],
                                       rtol=1e-5, atol=1e-5)
        # 6 single-row requests in one 200 ms window must NOT have taken 6
        # dispatches (the whole point); the exact grouping is timing-defined.
        assert batcher.stats["requests"] == 6
        assert batcher.stats["dispatches"] < 6
        assert batcher.stats["max_coalesced"] >= 2
        # Phase instrumentation (round 5, p99 attribution): one
        # (queue_wait, exec) pair per request, consistent with the dispatch
        # count, and summarized by phase_summary().
        assert len(batcher.stats["queue_wait_ms"]) == 6
        assert len(batcher.stats["exec_ms"]) == 6
        assert len(batcher.stats["dispatch_rows"]) == batcher.stats["dispatches"]
        assert sum(batcher.stats["dispatch_rows"]) == 6
        assert all(v >= 0.0 for v in batcher.stats["queue_wait_ms"])
        assert all(v > 0.0 for v in batcher.stats["exec_ms"])
        summary = batcher.phase_summary()
        for k in ("queue_wait_ms", "exec_ms"):
            assert summary[k]["p50"] <= summary[k]["p99"] <= summary[k]["max"]
    finally:
        batcher.close()


def test_dynamic_batcher_isolates_incompatible_and_failing(tmp_path):
    """A bad request coalesced with good ones must fail alone: different
    trailing shapes are never concatenated, and a shape that crashes the
    predictor is retried per-request so co-travelers still succeed."""
    import threading

    from eyegaze_tpu.serving import DynamicBatcher

    pred = _tiny_eeg_predictor(tmp_path)
    r = np.random.default_rng(47)
    good1 = r.normal(size=(1, C, T)).astype(np.float32)
    good2 = r.normal(size=(1, C, T)).astype(np.float32)
    want = pred.predict(good1, good2)
    bad = r.normal(size=(1, C + 1, T)).astype(np.float32)  # wrong channels

    batcher = DynamicBatcher(pred, max_wait_ms=200.0)
    try:
        results = {}

        def call(name, a, b):
            try:
                results[name] = batcher.predict(a, b)
            except Exception as e:  # noqa: BLE001
                results[name] = e

        threads = [threading.Thread(target=call, args=("good", good1, good2)),
                   threading.Thread(target=call, args=("bad", bad, bad))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert isinstance(results["bad"], Exception)
        np.testing.assert_allclose(results["good"]["logits"], want["logits"],
                                   rtol=1e-5, atol=1e-5)
    finally:
        batcher.close()


def test_http_serving_dynamic_batch(tmp_path):
    """scripts/serve.py --dynamic-batch path: concurrent single-sample posts
    coalesce into shared dispatches and still return per-request answers."""
    import importlib.util
    import io
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from pathlib import Path as P

    from eyegaze_tpu.serving import DynamicBatcher

    pred = _tiny_eeg_predictor(tmp_path)
    ckpt = tmp_path / "best_model"
    root = P(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "serve_cli_dyn", root / "scripts" / "serve.py")
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    r = np.random.default_rng(53)
    e1 = r.normal(size=(4, C, T)).astype(np.float32)
    e2 = r.normal(size=(4, C, T)).astype(np.float32)
    want = pred.predict(e1, e2)
    batcher = DynamicBatcher(pred, max_wait_ms=200.0)
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler("eeg", pred, ckpt, batcher))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        results = [None] * 4

        def post_one(i):
            buf = io.BytesIO()
            np.savez(buf, eeg1=e1[i:i + 1], eeg2=e2[i:i + 1])
            req = urllib.request.Request(f"{base}/predict",
                                         data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                results[i] = _json.load(resp)

        threads = [threading.Thread(target=post_one, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, res in enumerate(results):
            assert res is not None, f"post {i} never completed"
            np.testing.assert_allclose(np.asarray(res["logits"]),
                                       want["logits"][i:i + 1],
                                       rtol=1e-4, atol=1e-4)
        with urllib.request.urlopen(f"{base}/info", timeout=30) as resp:
            info = _json.load(resp)
        db = info["dynamic_batch"]
        assert db["requests"] == 4 and db["dispatches"] < 4
    finally:
        server.shutdown()
        server.server_close()
        batcher.close()


def test_hypereeg_predictor_from_checkpoint(tmp_path):
    """HyperEEG serving: trainer-stamped constructor kwargs rebuild the exact
    model; bucketed predictions match a direct apply; serve.py sniffs the
    kind."""
    import importlib.util
    from pathlib import Path as P

    from eyegaze_tpu.models.hypereeg import create_hypereeg_model
    from eyegaze_tpu.serving import HyperEEGPredictor

    model = create_hypereeg_model("full", in_channels=C, embed_dim=32,
                                  num_heads=4, sinc_kernel_size=33,
                                  sample_rate=256.0)
    r = np.random.default_rng(59)
    e = jnp.asarray(r.normal(size=(1, C, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), e, e)
    state = create_train_state(model, variables, make_optimizer(1e-3))
    stamp = {f: getattr(model, f)
             for f in ("in_channels", "num_classes", "embed_dim", "num_heads",
                       "sample_rate", "sinc_kernel_size", "use_sinc",
                       "use_graph", "use_cross_attn", "use_uncertainty")}
    CheckpointManager(tmp_path).save_if_best(
        0.9, state, config={"model": {"hypereeg": stamp}})
    ckpt = tmp_path / "best_model"

    pred = HyperEEGPredictor.from_checkpoint(ckpt, batch_buckets=(2, 4))
    e1 = r.normal(size=(3, C, T)).astype(np.float32)
    e2 = r.normal(size=(3, C, T)).astype(np.float32)
    out = pred.predict(e1, e2)
    want = model.apply({"params": variables["params"]}, e1, e2)["logits"]
    # Predictor runs bf16 compute; direct apply above is f32.
    np.testing.assert_allclose(out["logits"], np.asarray(want),
                               rtol=5e-2, atol=5e-2)
    assert (out["preds"] == np.argmax(np.asarray(want), -1)).all()

    root = P(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "serve_cli_hyper", root / "scripts" / "serve.py")
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)
    assert serve.sniff_kind(ckpt) == "hypereeg"
    assert serve.input_spec("hypereeg", pred)["eeg1"] == ["N", C, "T"]
