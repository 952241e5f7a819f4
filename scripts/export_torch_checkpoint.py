#!/usr/bin/env python
"""Export an orbax checkpoint back to a reference-compatible torch .pt file.

The inverse of ``scripts/import_torch_checkpoint.py``, completing the
round trip: models trained (or fine-tuned) in this framework can be loaded
by the reference's PyTorch classes — DualEEGTransformer, ART, the timm-backed
fusion ViTs, or the multimodal composite — e.g. for deployment in an existing
torch stack.

The exported state_dict is parameter-only: load it with
``model.load_state_dict(sd, strict=False)``. The keys it omits are exactly
the torch side's registered buffers (sinusoidal ``pe`` tables, the STFT Hann
``window``), which are deterministic constructor constants the torch model
re-creates identically — nothing learned is lost, and the porters' roundtrip
tests pin ``port(export(params)) == params`` exactly.

The model kind is sniffed from the checkpoint meta / param tree the same way
``scripts/serve.py`` does; pass --kind to override.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sniff_kind(meta: dict, params: dict) -> str:
    mc = meta.get("config", {}).get("model", {})
    if "multimodal" in mc or "gaze_encoder" in params:
        return "multimodal"
    if mc.get("kind") in ("early", "late"):
        return f"gaze_{mc['kind']}"
    if "backbone" in params:
        return "gaze_early"
    if "encoder" in params and "classifier" in params and "cls_token" not in params:
        return "gaze_late"
    if "embedding_size" in mc or "reconstructor" in params:
        return "art"
    return "dual_eeg"


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Export an orbax checkpoint to a torch state_dict")
    ap.add_argument("checkpoint", type=Path,
                    help="orbax checkpoint dir (e.g. runs/x/checkpoints/best_model)")
    ap.add_argument("--out", type=Path, required=True, help="output .pt path")
    ap.add_argument("--kind", default=None,
                    choices=["dual_eeg", "art", "gaze_early", "gaze_late",
                             "multimodal"])
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp
    import torch

    from eyegaze_tpu.models import torch_port

    ckpt = args.checkpoint.resolve()
    meta_path = ckpt.parent / f"{ckpt.name}.meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    params = ocp.StandardCheckpointer().restore(ckpt)["params"]
    kind = args.kind or sniff_kind(meta, params)
    export = {
        "dual_eeg": torch_port.export_dual_eeg_state_dict,
        "art": torch_port.export_art_state_dict,
        "gaze_early": torch_port.export_gaze_early_state_dict,
        "gaze_late": torch_port.export_gaze_late_state_dict,
        "multimodal": torch_port.export_multimodal_state_dict,
    }[kind]
    state = export(params)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state.items()}, args.out)
    n = sum(v.size for v in state.values())
    print(f"[export] {ckpt} kind={kind} -> {args.out} "
          f"({len(state)} tensors, {n:,} params; load with strict=False)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
