#!/usr/bin/env python
"""Dump XLA cost analysis (FLOPs / bytes accessed) of the compiled flagship
forward, the committed evidence behind BASELINE.md's HBM-roofline table
(VERDICT r3 #2: every BASELINE.md number must trace to a committed artifact).

Cost analysis is a property of the compiled program — deterministic, no
timing involved — so one compile per batch size suffices.  Paired with the
host-fetch-fenced times in ``measurements/profile_components_{16,64}.json``
(forward_full_ms), it yields achieved TFLOP/s, achieved GB/s, and the
arithmetic intensity against the v5e ridge point (197 TFLOP/s bf16,
819 GB/s HBM → ~240 FLOP/B).

    python scripts/dump_roofline.py --out measurements/roofline_r4.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.models.dual_eeg import DualEEGTransformer

V5E_PEAK_FLOPS = 197e12
V5E_PEAK_HBM = 819e9


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, nargs="+", default=[80, 320])
    ap.add_argument("--out", default="measurements/roofline_r4.json")
    args = ap.parse_args(argv)

    model = DualEEGTransformer(
        in_channels=32, num_classes=3, d_model=256, num_layers=6, num_heads=8,
        d_ff=1024, max_len=256, sampling_rate=256.0, use_spectrogram=True,
        use_ibs=True, use_robust_ibs=True, use_cross_attention=True,
        dtype=jnp.bfloat16,
    )
    r = np.random.default_rng(0)
    w0 = jnp.asarray(r.normal(size=(1, 32, 1024)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), w0, w0)["params"]

    fwd = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b)["logits"])

    rows = []
    for nw in args.windows:
        e1 = jnp.asarray(r.normal(size=(nw, 32, 1024)), jnp.float32)
        e2 = jnp.asarray(r.normal(size=(nw, 32, 1024)), jnp.float32)
        compiled = fwd.lower(params, e1, e2).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        rows.append({
            "windows": nw,
            "flops": flops,
            "bytes_accessed": byts,
            "intensity_flop_per_byte": round(flops / byts, 2) if byts else None,
        })
        print(f"[roofline] {nw} windows: {flops/1e9:.1f} GFLOP, "
              f"{byts/1e9:.2f} GB, {flops/byts:.1f} FLOP/B"
              if byts else f"[roofline] {nw} windows: no byte counts",
              file=sys.stderr, flush=True)

    out = {
        "model": "DualEEGTransformer flagship (bf16, f32-HIGHEST spectral)",
        "device_kind": jax.devices()[0].device_kind,
        "peaks": {"bf16_flops": V5E_PEAK_FLOPS, "hbm_bytes_per_s": V5E_PEAK_HBM,
                  "ridge_flop_per_byte": round(V5E_PEAK_FLOPS / V5E_PEAK_HBM, 1)},
        "note": "pair with forward_full_ms minus dispatch_floor_ms from "
                "measurements/profile_components_{16,64}.json for achieved "
                "TFLOP/s and GB/s",
        "rows": rows,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out["rows"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
