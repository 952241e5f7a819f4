#!/usr/bin/env python
"""Full-scale synthetic dataset rehearsal: the COMPLETE reference workflow at
the reference's real data shape and volume (VERDICT r2 #5).

Generates a reference-shaped dataset on disk — 4,463 trials over the 28 real
pairs (12-40, 18 excluded) with the real class distribution (Single 2233 /
Competition 1112 / Cooperation 1118, complete_metadata.json counts), pair
split 3,187 train (pairs 12-32) / 1,276 val (pairs 33-40,
experiments_list.md:51-56) — then drives every stage once and records
per-stage wall-clock:

  1. metadata generation + verification (reference-convention file stems,
     analyze_entropy.py:110-179 patterns)
  2. raw EEG npy volume (4,463 x 2 x (32, 3250) f32 = ~7.4 GB on disk)
  3. CSV subset at real size -> preprocess_eeg_raw.py converter
  4. full-resolution 3000x1583 JPG subset -> convert_gaze_images.py
     (the reference's ~0.1-0.2 s/sample CPU stage, 1_Data README:207-209)
  5. window preprocessing of ALL trials (window 1024 / stride 256) —
     MUST reproduce 28,683 / 11,484 train/val windows (9 windows/trial)
  6. connectivity feature extraction on a bounded trial subset (timed rate)
  7. flagship DualEEGTransformer training, 1 epoch over the real window set
  8. gaze ViT training on the converted subset
  9. analysis CLIs over the real files (analyze_entropy --gaze-dir/--eeg-dir)

Usage:
  python scripts/rehearsal_full_scale.py --root runs/rehearsal \
      [--stages gen,convert,windows,features,train,analyze] [--trials 4463]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent

# Reference dataset constants (complete_metadata.json, experiments_list.md).
CLASS_COUNTS = {"Single": 2233, "Competition": 1112, "Cooperation": 1118}
TRAIN_PAIRS = [p for p in range(12, 33) if p != 18]  # 20 pairs
VAL_PAIRS = list(range(33, 41))  # 8 pairs
N_TRAIN, N_VAL = 3187, 1276
C, T_RAW = 32, 3250
JPG_H, JPG_W = 1583, 3000  # PIL size=(W,H) -> native 3000x1583 images


def _stem(pair: int, cls: str, trial: int, player_idx: int) -> str:
    """Reference-convention file stem (analyze_entropy.py:110-179)."""
    if cls == "Single":
        ab = "A" if player_idx == 0 else "B"
        role = "player" if player_idx == 0 else "observer"
        return f"Pair-{pair}-{ab}-Single-EYE_trial{trial}_{role}"
    tag = "Comp" if cls == "Competition" else "Coop"
    return f"Pair-{pair}-{tag}-EYE_trial{trial}_player{'A' if player_idx == 0 else 'B'}"


def build_metadata(n_trials: int):
    """Distribute ``n_trials`` with the real class ratios over the real pairs
    so the pair split reproduces the reference's 3,187/1,276 trial counts."""
    scale = n_trials / sum(CLASS_COUNTS.values())
    counts = {k: round(v * scale) for k, v in CLASS_COUNTS.items()}
    counts["Single"] += n_trials - sum(counts.values())  # exact total
    n_train = round(N_TRAIN * scale)

    # Interleave classes so every pair sees all three.
    classes = []
    for cls, n in counts.items():
        classes += [cls] * n
    rng = np.random.default_rng(42)
    rng.shuffle(classes)

    records = []
    trial_no = {}
    for i, cls in enumerate(classes):
        if i < n_train:
            pair = TRAIN_PAIRS[i % len(TRAIN_PAIRS)]
        else:
            pair = VAL_PAIRS[i % len(VAL_PAIRS)]
        key = (pair, cls)
        trial_no[key] = trial_no.get(key, 0) + 1
        t = trial_no[key]
        records.append({
            "pair": pair,
            "player1": _stem(pair, cls, t, 0),
            "player2": _stem(pair, cls, t, 1),
            "class": cls,
            "formal_sen": float(rng.uniform(1, 7)),
            "lively_sen": float(rng.uniform(1, 7)),
        })
    return records


def gen_eeg_volume(meta, out_dir: Path, chunk: int = 256):
    """Unsplit raw-trial npy volume at full scale, written via memmap."""
    from eyegaze_tpu.data.metadata import LABEL2ID

    out_dir.mkdir(parents=True, exist_ok=True)
    n = len(meta)
    labels = np.asarray([LABEL2ID[m["class"]] for m in meta], np.int32)
    pairs = np.asarray([m["pair"] for m in meta], np.int32)
    e1 = np.lib.format.open_memmap(out_dir / "eeg1.npy", mode="w+",
                                   dtype=np.float32, shape=(n, C, T_RAW))
    e2 = np.lib.format.open_memmap(out_dir / "eeg2.npy", mode="w+",
                                   dtype=np.float32, shape=(n, C, T_RAW))
    rng = np.random.default_rng(7)
    t = np.arange(T_RAW, dtype=np.float32) / 256.0
    for s in range(0, n, chunk):
        m = min(chunk, n - s)
        # Class-conditioned base rhythm (8/10/12 Hz) + pink-ish noise so the
        # training stage sees learnable class structure, like data/synthetic.
        freq = 8.0 + 2.0 * labels[s:s + m, None, None]
        base = np.sin(2 * np.pi * freq * t[None, None, :]
                      + rng.uniform(0, 2 * np.pi, (m, C, 1)))
        e1[s:s + m] = base + rng.normal(0, 0.8, (m, C, T_RAW))
        e2[s:s + m] = base * (0.5 + 0.5 * (labels[s:s + m, None, None] == 2)) \
            + rng.normal(0, 0.8, (m, C, T_RAW))
    e1.flush()
    e2.flush()
    np.save(out_dir / "labels.npy", labels)
    np.save(out_dir / "pairs.npy", pairs)
    return n


def gen_csv_subset(meta, csv_dir: Path, eeg_dir: Path, n_csv: int):
    """First ``n_csv`` trials as real-size (32 x 3250) reference-format CSVs."""
    csv_dir.mkdir(parents=True, exist_ok=True)
    e1 = np.load(eeg_dir / "eeg1.npy", mmap_mode="r")
    e2 = np.load(eeg_dir / "eeg2.npy", mmap_mode="r")
    for i, m in enumerate(meta[:n_csv]):
        for stem, arr in ((m["player1"], e1[i]), (m["player2"], e2[i])):
            rows = [",".join(f"{v:.4f}" for v in row) for row in np.asarray(arr)]
            (csv_dir / f"{stem}.csv").write_text("\n".join(rows) + "\n")
    return n_csv * 2


def jpg_subset(meta, n_jpg: int):
    """First trials are all train pairs (build_metadata order), so mix in a
    tail of val-pair trials or the gaze train stage has an empty val split.
    Needs n_jpg >= 2: one train-pair head + one val-pair tail minimum."""
    if n_jpg < 2:
        raise ValueError(f"--jpg-trials must be >= 2 (got {n_jpg}): the gaze "
                         "stage needs at least one train-pair and one "
                         "val-pair trial")
    n_val = max(min(16, n_jpg // 4), 1)
    return meta[: n_jpg - n_val] + meta[-n_val:]


def gen_jpg_subset(meta, jpg_dir: Path, n_jpg: int):
    """Full-resolution 3000x1583 class-conditioned heatmap JPGs."""
    from PIL import Image

    from eyegaze_tpu.data.metadata import LABEL2ID
    from eyegaze_tpu.data.synthetic import synthetic_gaze_heatmap

    jpg_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(11)
    for m in jpg_subset(meta, n_jpg):
        label = LABEL2ID[m["class"]]
        for stem in (m["player1"], m["player2"]):
            # Generate at 1/4 scale, upsample to native size: the heatmaps are
            # smooth blobs, and this keeps generation CPU-bounded while the
            # JPEG files are real 3000x1583 inputs for decode/resize stages.
            small = synthetic_gaze_heatmap(label, H=JPG_H // 4, W=JPG_W // 4, rng=rng)
            img = (np.transpose(small, (1, 2, 0)) * 255).astype(np.uint8)
            Image.fromarray(img).resize((JPG_W, JPG_H), Image.BILINEAR).save(
                jpg_dir / f"{stem}.jpg", quality=90)
    return n_jpg * 2


def run_cli(args, timeout=7200, env=None):
    import os

    print(f"  $ {' '.join(str(a) for a in args)}")
    r = subprocess.run([sys.executable, *[str(a) for a in args]], cwd=ROOT,
                       timeout=timeout, env={**os.environ, **(env or {})})
    if r.returncode != 0:
        raise RuntimeError(f"stage failed: {args[0]} (rc={r.returncode})")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/rehearsal")
    ap.add_argument("--trials", type=int, default=4463)
    ap.add_argument("--csv-trials", type=int, default=100)
    ap.add_argument("--jpg-trials", type=int, default=112)
    ap.add_argument("--features-trials", type=int, default=64)
    ap.add_argument("--eeg-epochs", type=int, default=1)
    ap.add_argument("--gaze-epochs", type=int, default=1)
    ap.add_argument("--stages", default="gen,convert,windows,features,train,analyze")
    args = ap.parse_args(argv)

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    stages = set(args.stages.split(","))
    report_path = root / "rehearsal_report.json"
    report = json.loads(report_path.read_text()) if report_path.exists() else {}
    report.setdefault("config", vars(args))

    meta_path = root / "complete_metadata.json"
    eeg_dir = root / "eeg_npy"
    csv_dir = root / "eeg_csv"
    jpg_dir = root / "gaze_jpg"
    win_dir = root / "windows"
    feat_dir = root / "features"

    def timed(name, fn):
        print(f"[stage] {name}")
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        report[name] = {"wall_s": round(dt, 1), **(out or {})}
        report_path.write_text(json.dumps(report, indent=2))
        print(f"[stage] {name}: {dt:.1f}s")
        return out

    if "gen" in stages:
        def _gen_meta():
            meta = build_metadata(args.trials)
            meta_path.write_text(json.dumps(meta))
            from eyegaze_tpu.data.metadata import verify_metadata

            rep = verify_metadata(meta)
            n_train = sum(1 for m in meta if m["pair"] in set(TRAIN_PAIRS))
            return {"trials": len(meta), "train_trials": n_train,
                    "val_trials": len(meta) - n_train,
                    "verify_ok": bool(rep.get("ok", True))}
        timed("gen_metadata", _gen_meta)
        meta = json.loads(meta_path.read_text())
        timed("gen_eeg_volume", lambda: {
            "trials": gen_eeg_volume(meta, eeg_dir),
            "bytes": (eeg_dir / "eeg1.npy").stat().st_size * 2})
        timed("gen_csv_subset", lambda: {
            "files": gen_csv_subset(meta, csv_dir, eeg_dir, args.csv_trials)})
        timed("gen_jpg_subset", lambda: {
            "files": gen_jpg_subset(meta, jpg_dir, args.jpg_trials),
            "resolution": f"{JPG_W}x{JPG_H}"})

    meta = json.loads(meta_path.read_text())

    if "convert" in stages:
        # Converter runs over the subset that exists as CSV/JPG files.
        csv_meta = root / "csv_metadata.json"
        csv_meta.write_text(json.dumps(meta[:args.csv_trials]))
        jpg_meta = root / "jpg_metadata.json"
        jpg_meta.write_text(json.dumps(jpg_subset(meta, args.jpg_trials)))
        timed("convert_eeg_csv", lambda: run_cli([
            "scripts/preprocess_eeg_raw.py", "--metadata", csv_meta,
            "--eeg-dir", csv_dir, "--output-dir", root / "eeg_from_csv"]))
        timed("convert_gaze_jpg", lambda: run_cli([
            "scripts/convert_gaze_images.py", "--metadata", jpg_meta,
            "--image-root", jpg_dir, "--output", root / "gaze_converted"]))
        # Round-trip check: converter output must equal the generated volume.
        conv = np.load(root / "eeg_from_csv" / "train_eeg1.npy", mmap_mode="r")
        orig = np.load(eeg_dir / "eeg1.npy", mmap_mode="r")
        err = float(np.abs(conv[0] - orig[0]).max())
        report["convert_eeg_csv"]["roundtrip_max_err"] = err
        assert err < 1e-3, f"CSV round-trip error {err}"
        report_path.write_text(json.dumps(report, indent=2))

    if "windows" in stages:
        def _windows():
            run_cli(["scripts/preprocess_eeg_windows.py", "--input-dir", eeg_dir,
                     "--output-dir", win_dir, "--sampling-rate", 256,
                     "--window-size", 1024, "--stride", 256,
                     "--split-mode", "pair"])
            tr = json.loads((win_dir / "train_metadata.json").read_text())
            va = json.loads((win_dir / "val_metadata.json").read_text())
            return {"train_windows": tr["windows"], "val_windows": va["windows"],
                    "expected": [28683, 11484]}
        out = timed("windows_full", _windows)
        if args.trials == 4463:
            assert out["train_windows"] == 28683, out
            assert out["val_windows"] == 11484, out

    if "features" in stages:
        def _features():
            sub = feat_dir / "input"
            sub.mkdir(parents=True, exist_ok=True)
            n = args.features_trials
            for f in ("eeg1", "eeg2", "labels", "pairs"):
                np.save(sub / f"{f}.npy",
                        np.load(eeg_dir / f"{f}.npy", mmap_mode="r")[:n])
            run_cli(["scripts/extract_eeg_features.py", "--input-dir", sub,
                     "--output-dir", feat_dir / "out", "--sampling-rate", 256])
            return {"trials": n}
        out = timed("extract_features", _features)
        report["extract_features"]["sec_per_trial"] = round(
            report["extract_features"]["wall_s"] / args.features_trials, 2)
        report["extract_features"]["full_4463_extrapolated_min"] = round(
            report["extract_features"]["sec_per_trial"] * 4463 / 60, 1)
        report_path.write_text(json.dumps(report, indent=2))

    if "train" in stages:
        # A previous run's best_metric.json would make this run's checkpoint
        # look non-improving and best_model would never refresh — the analyze
        # stage would then silently analyze the stale model (CLAUDE.md
        # "runs/ is disposable" hazard).
        import shutil

        shutil.rmtree(root / "eeg_run", ignore_errors=True)
        cfg = root / "eeg_train_cfg.yaml"
        cfg.write_text(f"""
model: {{in_channels: 32, num_labels: 3, d_model: 256, num_layers: 6, num_heads: 8, d_ff: 1024}}
data: {{eeg_base_path: {win_dir}, window_size: 1024, stride: 1024, sampling_rate: 256.0}}
training:
  output_dir: {root / 'eeg_run'}
  num_train_epochs: {args.eeg_epochs}
  per_device_train_batch_size: 128
  use_ibs_cls_loss: true
""")
        timed("train_eeg_full_windows", lambda: run_cli(
            ["scripts/train_dual_eeg.py", "--config", cfg]))
        timed("train_gaze_converted", lambda: run_cli(
            ["scripts/train_gaze.py", "--config", "configs/gaze_earlyfusion.yaml",
             "--model", "early", "--epochs", args.gaze_epochs,
             "--batch-size", 16, "--images", root / "gaze_converted"]))

    if "analyze" in stages:
        timed("analyze_entropy_real_files", lambda: run_cli(
            ["scripts/analyze_entropy.py", "--gaze-dir", jpg_dir,
             "--eeg-dir", csv_dir, "--output-dir", root / "entropy_out",
             "--fs", 256]))
        ckpt = root / "eeg_run" / "checkpoints" / "best_model"
        if ckpt.exists():
            timed("analyze_eeg_ckpt", lambda: run_cli(
                ["scripts/analyze_eeg.py", "--checkpoint", ckpt,
                 "--output-dir", root / "eeg_analysis",
                 "--analyses", "metrics"]))

    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
