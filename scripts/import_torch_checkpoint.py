#!/usr/bin/env python
"""Import a reference PyTorch checkpoint into a servable orbax checkpoint.

Migration entry point for users arriving from `roseDwayane/EyeGaze-Multimodal`
with trained torch weights: maps the state_dict into this framework's Flax
trees (``eyegaze_tpu.models.torch_port``), infers the architecture from the
tensor shapes where possible, and writes ``<out>/best_model`` +
``best_model.meta.json`` in exactly the layout the serving predictors and
analysis CLIs reconstruct models from — so an imported checkpoint is
immediately usable by ``scripts/serve.py``, ``analyze_eeg.py`` etc.

Supported kinds (auto-sniffed from the state_dict keys):
- ``dual_eeg``  — DualEEGTransformer (dual_eeg_transformer.py:977-1107)
- ``art``       — ArtifactRemovalTransformer (art.py:566-601)
- ``gaze_early`` / ``gaze_late`` — the timm-backed fusion ViTs
  (early_fusion_vit.py:32-177, late_fusion_vit.py:33-132)

Accepted file formats: a raw ``state_dict`` .pt/.pth, or a dict containing
one under 'state_dict' / 'model_state_dict' / 'model' (the usual torch
training-loop wrappers); ``module.`` DataParallel prefixes are stripped.

What is NOT inferable from shapes is taken from flags with the reference's
defaults (num_heads, conv_stride, STFT geometry, sampling rate, ART z-score
mode) — pass them explicitly if the training run changed them.
"""

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_state_dict(path: Path) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("state_dict", "model_state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    if not isinstance(obj, dict):
        raise SystemExit(f"{path}: not a state_dict (got {type(obj).__name__})")
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def sniff_kind(state: dict) -> str:
    keys = state.keys()
    if any(k.startswith("gaze_encoder.") for k in keys):
        return "multimodal"  # composite wraps eeg_encoder.temporal_conv.*
    if any(k.startswith("temporal_conv.") for k in keys):
        return "dual_eeg"
    if any(k.startswith("reconstructor.") for k in keys):
        return "art"
    if any(k.startswith("backbone.") for k in keys):
        return "gaze_early"
    if any(k.startswith("encoder.patch_embed") for k in keys):
        return "gaze_late"
    raise SystemExit("cannot sniff model kind from state_dict keys; pass --kind")


def _count(state: dict, fmt: str) -> int:
    n = 0
    while fmt.format(n) in state:
        n += 1
    return n


def import_dual_eeg(state: dict, args) -> tuple:
    import jax
    import numpy as np

    from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
    from eyegaze_tpu.models.torch_port import port_dual_eeg_state_dict

    d_model = state["cls_token"].shape[-1]
    conv0 = state["temporal_conv.convs.0.weight"]  # (d, C, k)
    use_robust = "ibs_tokenizer.type_embedding" in state
    use_scalar = "ibs_generator.proj.0.weight" in state
    ftype = "all"
    if use_robust:
        ntok = state["ibs_tokenizer.type_embedding"].shape[1]
        ftype = {42: "all", 24: "phase", 18: "amplitude"}[ntok]
    model = DualEEGTransformer(
        in_channels=int(conv0.shape[1]),
        num_classes=int(state["classifier.3.weight"].shape[0]),
        d_model=int(d_model),
        num_layers=_count(state, "encoder.layers.{}.ln1.weight"),
        num_heads=args.num_heads or 8,
        d_ff=int(state["encoder.layers.0.ffn.linear1.weight"].shape[0]),
        max_len=int(state["pos_embed.pos_embed.weight"].shape[0]),
        conv_kernel_size=int(conv0.shape[2]),
        conv_stride=args.conv_stride,
        conv_layers=_count(state, "temporal_conv.convs.{}.weight"),
        sampling_rate=args.sampling_rate,
        spec_n_fft=args.spec_n_fft,
        spec_hop_length=args.spec_hop_length,
        use_spectrogram="spectrogram_generator.proj.0.weight" in state,
        use_robust_ibs=use_robust,
        use_ibs=use_robust or use_scalar,
        use_cross_attention="cross_attn.norm.weight" in state,
        ibs_instance_norm="ibs_tokenizer.instance_norm.weight" in state,
        ibs_feature_type=ftype,
    )
    t = max(4 * model.conv_stride**model.conv_layers, model.spec_n_fft + 1)
    z = np.zeros((1, model.in_channels, t), np.float32)
    template = model.init(jax.random.PRNGKey(0), z, z)["params"]
    params = port_dual_eeg_state_dict(template, state)
    config = {
        "model": {
            "in_channels": model.in_channels, "num_labels": model.num_classes,
            "d_model": model.d_model, "num_layers": model.num_layers,
            "num_heads": model.num_heads, "d_ff": model.d_ff,
            "conv_kernel_size": model.conv_kernel_size,
            "conv_stride": model.conv_stride, "conv_layers": model.conv_layers,
            "spec_n_fft": model.spec_n_fft,
            "spec_hop_length": model.spec_hop_length,
            "spec_freq_bins": model.spec_freq_bins,
        },
        "ablation": {
            "use_spectrogram": model.use_spectrogram,
            "use_ibs": model.use_ibs,
            "ibs_mode": "robust" if model.use_robust_ibs else "scalar",
            "use_cross_attention": model.use_cross_attention,
            "ibs_instance_norm": model.ibs_instance_norm,
            "ibs_feature_type": model.ibs_feature_type,
        },
        "data": {"sampling_rate": args.sampling_rate,
                 "enable_preprocessing": args.preprocess},
    }
    return params, config


def import_art(state: dict, args) -> tuple:
    import dataclasses

    import jax
    import numpy as np

    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer
    from eyegaze_tpu.models.torch_port import port_art_state_dict

    learned = "src_embed.1.pos_embed.weight" in state
    if learned:
        max_len = int(state["src_embed.1.pos_embed.weight"].shape[0])
    elif "src_embed.1.pe" in state:
        max_len = int(state["src_embed.1.pe"].shape[1])
    else:
        max_len = args.max_len
    cfg = ArtConfig(
        in_channels=int(state["src_embed.0.conv.weight"].shape[1]),
        out_channels=int(state["reconstructor.proj.weight"].shape[0]),
        embedding_size=int(state["src_embed.0.conv.weight"].shape[0]),
        num_encoder_layers=_count(state, "encoder.layers.{}.ln1.weight"),
        num_decoder_layers=_count(state, "decoder.layers.{}.ln1.weight"),
        num_heads=args.num_heads or 8,
        feedforward_size=int(state["encoder.layers.0.ffn.linear1.weight"].shape[0]),
        max_len=max_len,
        pos_mode="learned" if learned else "sinusoidal",
        recon_log_softmax=args.recon_log_softmax,
        recon_zscore=args.recon_zscore or None,
    )
    model = ArtifactRemovalTransformer(cfg)
    z = np.zeros((1, cfg.in_channels, min(cfg.max_len, 64)), np.float32)
    template = model.init(jax.random.PRNGKey(0), z, z)["params"]
    params = port_art_state_dict(template, state)
    return params, {"model": dataclasses.asdict(cfg)}


def import_multimodal(state: dict, args) -> tuple:
    """MultimodalFusionModel (train_multimodal_fuzzy_fusion.py:106-179):
    gaze_encoder.backbone (timm ViT) + eeg_encoder (DualEEGTransformer) +
    fusion (FuzzyGatingFusion). Stamps the exact constructor kwargs under
    config.model.multimodal — the same contract train_multimodal.py uses, so
    MultimodalPredictor rebuilds the identical composite."""
    import jax
    import numpy as np

    from eyegaze_tpu.models.multimodal import MultimodalFusionModel
    from eyegaze_tpu.models.torch_port import port_multimodal_state_dict

    g = "gaze_encoder.backbone"
    vit_embed = int(state[f"{g}.cls_token"].shape[-1])
    n_patches = int(state[f"{g}.pos_embed"].shape[1]) - 1
    img_size = int(round(math.sqrt(n_patches))) * 16
    in_ch = int(state[f"{g}.patch_embed.proj.weight"].shape[1])
    if in_ch == 6:
        gaze_fusion = "concat"
    elif args.fusion_mode:
        gaze_fusion = args.fusion_mode
    else:
        raise SystemExit("3-channel gaze encoder: pass --fusion-mode")
    e = "eeg_encoder"
    d_model = int(state[f"{e}.cls_token"].shape[-1])
    use_robust = f"{e}.ibs_tokenizer.type_embedding" in state
    use_scalar = f"{e}.ibs_generator.proj.0.weight" in state
    use_spec = f"{e}.spectrogram_generator.proj.0.weight" in state
    in_channels = int(state[f"{e}.temporal_conv.convs.0.weight"].shape[1])
    kwargs = dict(
        num_classes=int(state[f"{g}.head.weight"].shape[0]),
        gaze_fusion_mode=gaze_fusion,
        fuzzy_mode=args.fuzzy_mode,
        eeg_in_channels=in_channels,
        eeg_d_model=d_model,
        eeg_num_layers=_count(state, e + ".encoder.layers.{}.ln1.weight"),
        eeg_num_heads=args.num_heads or 8,
        eeg_d_ff=int(state[f"{e}.encoder.layers.0.ffn.linear1.weight"].shape[0]),
        eeg_max_len=int(state[f"{e}.pos_embed.pos_embed.weight"].shape[0]),
        sampling_rate=args.sampling_rate,
        use_spectrogram=use_spec,
        use_ibs=use_robust or use_scalar,
        use_robust_ibs=use_robust,
        use_cross_attention=f"{e}.cross_attn.norm.weight" in state,
        vit_embed_dim=vit_embed,
        vit_depth=_count(state, g + ".blocks.{}.norm1.weight"),
        vit_num_heads=args.num_heads or max(vit_embed // 64, 4),
        img_size=img_size,
    )
    model = MultimodalFusionModel(**kwargs)
    zi = np.zeros((1, 3, img_size, img_size), np.float32)
    ze = np.zeros((1, in_channels, 256), np.float32)
    template = model.init(jax.random.PRNGKey(0), zi, zi, ze, ze)["params"]
    params = port_multimodal_state_dict(template, state)
    return params, {"model": {"multimodal": kwargs,
                              "num_labels": kwargs["num_classes"]}}


def import_gaze(state: dict, kind: str, args) -> tuple:
    import jax
    import numpy as np

    from eyegaze_tpu.models.torch_port import (port_gaze_early_state_dict,
                                               port_gaze_late_state_dict)
    from eyegaze_tpu.models.vit import EarlyFusionViT, LateFusionViT

    prefix = "backbone" if kind == "gaze_early" else "encoder"
    embed = int(state[f"{prefix}.cls_token"].shape[-1])
    depth = _count(state, prefix + ".blocks.{}.norm1.weight")
    n_patches = int(state[f"{prefix}.pos_embed"].shape[1]) - 1
    img_size = int(round(math.sqrt(n_patches))) * 16  # patch16 family
    # timm ViTs use 64-dim heads (768/12); the reference never changes this.
    heads = args.num_heads or max(embed // 64, 4)
    if kind == "gaze_early":
        in_ch = int(state["backbone.patch_embed.proj.weight"].shape[1])
        if in_ch == 6:
            if args.fusion_mode not in ("concat", None):
                raise SystemExit("6-channel patch embed implies fusion_mode=concat")
            fusion = "concat"
        elif args.fusion_mode:
            fusion = args.fusion_mode
        else:
            raise SystemExit(
                "3-channel early-fusion checkpoint: pass --fusion-mode "
                "(add/subtract/subtract_abs/multiply — not in the shapes)")
        num_classes = int(state["backbone.head.weight"].shape[0])
        model = EarlyFusionViT(num_classes=num_classes, img_size=img_size,
                               fusion_mode=fusion, embed_dim=embed,
                               depth=depth, num_heads=heads)
        port = port_gaze_early_state_dict
        mkind = "early"
    else:
        num_classes = int(state["classifier.weight"].shape[0])
        ratio = state["classifier.weight"].shape[1] // embed
        fusion = {1: args.fusion_mode or "add", 2: "concat", 4: "full"}[ratio]
        model = LateFusionViT(num_classes=num_classes, img_size=img_size,
                              fusion_mode=fusion, embed_dim=embed,
                              depth=depth, num_heads=heads)
        port = port_gaze_late_state_dict
        mkind = "late"
    z = np.zeros((1, 3, img_size, img_size), np.float32)
    template = model.init(jax.random.PRNGKey(0), z, z)["params"]
    params = port(template, state)
    config = {"model": {"kind": mkind, "img_size": img_size,
                        "fusion_mode": fusion, "num_labels": num_classes,
                        "vit_num_heads": heads}}
    return params, config


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Import a reference torch checkpoint for TPU serving")
    ap.add_argument("checkpoint", type=Path, help=".pt/.pth state_dict file")
    ap.add_argument("--out", type=Path, required=True,
                    help="output directory (gets best_model/ + meta.json)")
    ap.add_argument("--kind", default=None,
                    choices=["dual_eeg", "art", "gaze_early", "gaze_late",
                             "multimodal"],
                    help="model family (default: sniff from the keys)")
    ap.add_argument("--fuzzy-mode", default="full",
                    choices=["full", "no_temperature", "no_fuzzification",
                             "fixed_weights"],
                    help="multimodal gating mode (not in the shapes)")
    ap.add_argument("--num-heads", type=int, default=None,
                    help="attention heads (not recoverable from shapes); "
                         "default 8 for dual_eeg/art (the reference default), "
                         "embed_dim/64 for the timm-backed gaze ViTs")
    ap.add_argument("--conv-stride", type=int, default=4)
    ap.add_argument("--sampling-rate", type=float, default=256.0)
    ap.add_argument("--spec-n-fft", type=int, default=128)
    ap.add_argument("--spec-hop-length", type=int, default=64)
    ap.add_argument("--preprocess", action="store_true",
                    help="stamp data.enable_preprocessing=True (CAR+z-score "
                         "at serving time; match the training pipeline)")
    ap.add_argument("--max-len", type=int, default=2048, help="ART fallback")
    ap.add_argument("--recon-log-softmax", action="store_true")
    ap.add_argument("--recon-zscore", default=None,
                    choices=[None, "batch", "time"])
    ap.add_argument("--fusion-mode", default=None,
                    help="gaze fusion mode when not shape-inferable "
                         "(3-channel early modes; late add/subtract/multiply)")
    args = ap.parse_args(argv)

    state = load_state_dict(args.checkpoint)
    kind = args.kind or sniff_kind(state)
    print(f"[import] {args.checkpoint} kind={kind} "
          f"({len(state)} tensors)")

    if kind == "dual_eeg":
        params, config = import_dual_eeg(state, args)
    elif kind == "art":
        params, config = import_art(state, args)
    elif kind == "multimodal":
        params, config = import_multimodal(state, args)
    else:
        params, config = import_gaze(state, kind, args)

    import jax
    import orbax.checkpoint as ocp

    out = args.out.absolute()
    out.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(out / "best_model",
              {"params": jax.device_get(params)}, force=True)
    ckpt.wait_until_finished()
    meta = {"config": config, "imported_from": str(args.checkpoint)}
    (out / "best_model.meta.json").write_text(json.dumps(meta, default=str))
    n = sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params))
    print(f"[import] wrote {out}/best_model ({n:,} params) + meta.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
