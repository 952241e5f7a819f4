#!/usr/bin/env python
"""Export timm/torch ViT weights to an .npz consumable by the Flax port.

The reference downloads ImageNet-21k ``vit_base_patch16_224`` through timm at
model build (``early_fusion_vit.py:84-101``).  This environment has no timm
and no network, so the port is a two-step contract:

1. run THIS script wherever timm (or a saved torch state dict) exists:
       python scripts/export_timm_weights.py \
           --model vit_base_patch16_224.augreg_in21k --output vit_b16.npz
   or, from an already-saved checkpoint (.pth/.bin, no timm needed):
       python scripts/export_timm_weights.py \
           --state-dict vit_b16.pth --output vit_b16.npz
2. train with it:
       python scripts/train_gaze.py ... --pretrained vit_b16.npz
   (``eyegaze_tpu.models.vit.load_timm_state_dict`` maps the timm names into
   the Flax tree, including the 6-channel patch-embed surgery for concat
   fusion, early_fusion_vit.py:103-147.)

The .npz keeps timm's own key names (``patch_embed.proj.weight``,
``blocks.N.attn.qkv.weight``, ...), float32.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# Keys the Flax port consumes; anything else (e.g. head.* for a different
# class count) is kept too but optional.
REQUIRED_PREFIXES = ("patch_embed.proj", "cls_token", "pos_embed", "norm.", "blocks.")


def _strip_prefixes(state: dict) -> dict:
    out = {}
    for k, v in state.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def state_from_timm(model_name: str) -> dict:
    import timm

    model = timm.create_model(model_name, pretrained=True)
    return model.state_dict()


def state_from_file(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj


def export(state: dict, output: str) -> dict:
    state = _strip_prefixes(state)
    arrays = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        arrays[k] = np.asarray(v, np.float32)
    missing = [p for p in REQUIRED_PREFIXES
               if not any(k.startswith(p) for k in arrays)]
    if missing:
        raise SystemExit(f"state dict lacks required key groups: {missing}")
    np.savez(output, **arrays)
    return arrays


def main(argv=None):
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="timm model name (needs timm + network)")
    src.add_argument("--state-dict", help="saved torch state dict (.pth/.bin)")
    ap.add_argument("--output", required=True, help=".npz output path")
    args = ap.parse_args(argv)

    if args.model:
        try:
            state = state_from_timm(args.model)
        except ImportError:
            raise SystemExit(
                "timm is not installed here; run this script in an "
                "environment with timm, or use --state-dict")
    else:
        state = state_from_file(args.state_dict)

    arrays = export(state, args.output)
    n_blocks = len({k.split(".")[1] for k in arrays if k.startswith("blocks.")})
    print(f"[export] {len(arrays)} tensors, {n_blocks} blocks, "
          f"embed={arrays['cls_token'].shape[-1]} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
