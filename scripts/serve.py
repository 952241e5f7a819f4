#!/usr/bin/env python
"""HTTP serving front-end for the framework's warm-jit predictors.

The reference has no serving surface at all — its analysis scripts re-run
ad-hoc inference loops (e.g. analyze_gaze.py:150-403 rebuilds the model and
loops over a DataLoader per figure).  This CLI restores ONE orbax checkpoint
into the matching ``eyegaze_tpu.serving`` predictor (EEG flagship, gaze ViT,
ART denoiser, or the multimodal composite), optionally pre-compiles every
batch bucket, and serves it over plain HTTP:

  GET  /healthz   -> {"status": "ok", ...}
  GET  /info      -> model kind, batch buckets, checkpoint path, input spec
                     (per-input expected shapes read off the restored model)
  GET  /metrics   -> request/error counts, p50/p90/p99 latency over the last
                     1024 requests, dynamic-batch coalescing stats
  POST /predict   -> body is an ``.npz`` archive (numpy ``savez``) with the
                     predictor's input arrays; response is JSON (default) or
                     ``.npz`` with ``?format=npz`` (binary outputs like ART's
                     denoised signals belong in npz).

Input arrays per kind (all leading-dim batched, any N — requests are
zero-padded to the compiled buckets and chunked above the largest):

  eeg         eeg1, eeg2           (N, C, T) float32 raw trial pairs
  gaze        img1, img2           (N, 3, H, W) uint8 image pairs
  art         noisy                (N, C, T) float32
  multimodal  img1, img2, eeg1, eeg2
  hypereeg    eeg1, eeg2           (N, C, T) float32 windowed pairs

Device work is serialized with a lock: predictors share one chip, and
request-level concurrency belongs at the batch dimension (send bigger
requests), not in racing XLA dispatches.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REQUIRED_INPUTS = {
    "eeg": ("eeg1", "eeg2"),
    "gaze": ("img1", "img2"),
    "art": ("noisy",),
    "multimodal": ("img1", "img2", "eeg1", "eeg2"),
    "hypereeg": ("eeg1", "eeg2"),
}


def sniff_kind(checkpoint_dir: Path) -> str:
    """Infer the predictor kind from the checkpoint meta (the same contract
    every ``from_checkpoint`` uses): the multimodal stamp, the gaze ``kind``
    stamp, ArtConfig-only fields, else the EEG flagship."""
    meta_path = checkpoint_dir.parent / f"{checkpoint_dir.name}.meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    mc = meta.get("config", {}).get("model", {})
    if "multimodal" in mc:
        return "multimodal"
    if "hypereeg" in mc:
        return "hypereeg"
    if mc.get("kind") in ("early", "late", "datafusion"):
        return "gaze"
    if "embedding_size" in mc or "num_decoder_layers" in mc:
        return "art"
    return "eeg"


def build_predictor(kind: str, checkpoint_dir: Path, buckets, mesh=False):
    from eyegaze_tpu import serving

    cls = {"eeg": serving.Predictor, "gaze": serving.GazePredictor,
           "art": serving.ArtDenoiser,
           "multimodal": serving.MultimodalPredictor,
           "hypereeg": serving.HyperEEGPredictor}[kind]
    return cls.from_checkpoint(checkpoint_dir, batch_buckets=tuple(buckets),
                               mesh=mesh)


def _to_jsonable(out: dict) -> dict:
    return {k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in out.items()}


def _to_npz_bytes(out: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in out.items()})
    return buf.getvalue()


def input_spec(kind: str, predictor) -> dict:
    """Per-input expected shape (None = any), read off the restored model —
    so clients can validate before posting (a mis-sized image otherwise costs
    a 500 after a full dispatch attempt)."""
    m = predictor.model
    if kind == "gaze":
        if not hasattr(m, "fusion_mode"):
            # datafusion: a bare VisionTransformer behind an on-device fuse +
            # resize — any (H, W) is accepted (serving.py GazePredictor).
            return {k: ["N", 3, "H", "W"] for k in ("img1", "img2")}
        s = getattr(m, "img_size", 224)
        return {k: ["N", 3, s, s] for k in ("img1", "img2")}
    if kind == "art":
        c = m.config.in_channels
        return {"noisy": ["N", c, f"T<={m.config.max_len}"]}
    if kind == "multimodal":
        s = getattr(m, "img_size", 224)
        c = getattr(m, "eeg_in_channels", 32)
        return {"img1": ["N", 3, s, s], "img2": ["N", 3, s, s],
                "eeg1": ["N", c, "T"], "eeg2": ["N", c, "T"]}
    c = getattr(m, "in_channels", 32)  # eeg flagship / hypereeg
    return {k: ["N", c, "T"] for k in ("eeg1", "eeg2")}


class _LatencyStats:
    """Lock-guarded ring buffer of request latencies -> p50/p90/p99."""

    def __init__(self, size: int = 1024):
        self._lat = []
        self._size = size
        self._lock = threading.Lock()
        self.requests = 0
        self.errors = 0

    def record(self, ms: float, error: bool = False):
        with self._lock:
            self.requests += 1
            self.errors += error
            self._lat.append(ms)
            if len(self._lat) > self._size:
                self._lat = self._lat[-self._size:]

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat)
            n = self.requests, self.errors
        out = {"requests": n[0], "errors": n[1]}
        if lat:
            for p in (50, 90, 99):
                out[f"latency_p{p}_ms"] = round(
                    lat[min(len(lat) - 1, int(len(lat) * p / 100))], 2)
        return out


def make_handler(kind: str, predictor, checkpoint_dir: Path, batcher=None,
                 stats: _LatencyStats | None = None):
    required = REQUIRED_INPUTS[kind]
    lock = threading.Lock()
    stats = stats or _LatencyStats()
    spec = input_spec(kind, predictor)

    class Handler(BaseHTTPRequestHandler):
        # Served responses are small JSON/npz; disable the default per-line
        # stderr chatter in favour of one structured line per request.
        def log_message(self, fmt, *args):
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: dict):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._send_json(200, {"status": "ok", "kind": kind})
            elif path == "/info":
                info = {
                    "kind": kind,
                    "checkpoint": str(checkpoint_dir),
                    "batch_buckets": list(predictor.buckets),
                    "inputs": list(required),
                    "input_spec": input_spec(kind, predictor),
                }
                if batcher is not None:
                    info["dynamic_batch"] = {
                        "max_wait_ms": batcher.max_wait * 1e3,
                        "max_batch": batcher.max_batch,
                        **batcher.public_stats()}
                self._send_json(200, info)
            elif path == "/metrics":
                metrics = stats.snapshot()
                if batcher is not None:
                    metrics["dynamic_batch"] = batcher.public_stats()
                self._send_json(200, metrics)
            else:
                self._send_json(404, {"error": f"unknown path {path!r}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                self._send_json(404, {"error": f"unknown path {url.path!r}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                arrays = dict(np.load(io.BytesIO(self.rfile.read(n)),
                                      allow_pickle=False))
            except Exception as e:  # malformed body must not kill the server
                self._send_json(400, {"error": f"bad npz body: {e}"})
                return
            missing = [k for k in required if k not in arrays]
            if missing:
                self._send_json(400, {
                    "error": f"missing input arrays {missing} (kind={kind!r} "
                             f"needs {list(required)})"})
                return
            scalar = [k for k in required if arrays[k].ndim == 0]
            if scalar:  # len() of a 0-d array raises; answer 400, not a
                self._send_json(400, {  # dropped connection
                    "error": f"inputs {scalar} are scalars; expected "
                             "leading-dim batched arrays"})
                return
            sizes = {len(arrays[k]) for k in required}
            if len(sizes) != 1:
                self._send_json(400, {"error": "input arrays disagree on "
                                               "batch size"})
                return
            for k in required:  # reject mis-shaped inputs BEFORE dispatching
                want, have = spec[k][1:], arrays[k].shape[1:]
                ok = len(have) == len(want) and all(
                    w == h for w, h in zip(want, have) if isinstance(w, int))
                if not ok:
                    self._send_json(400, {
                        "error": f"{k}: shape {list(arrays[k].shape)} does "
                                 f"not match expected {spec[k]} (see /info)"})
                    return
            t0 = time.perf_counter()
            try:
                if batcher is not None:
                    # the batcher's dispatcher thread is the device serializer
                    out = batcher.predict(*[arrays[k] for k in required])
                else:
                    with lock:  # one chip; batch dim is the concurrency axis
                        out = predictor.predict(*[arrays[k] for k in required])
            except Exception as e:
                stats.record((time.perf_counter() - t0) * 1e3, error=True)
                self._send_json(500, {"error": f"predict failed: {e}"})
                return
            ms = (time.perf_counter() - t0) * 1e3
            stats.record(ms)
            fmt = parse_qs(url.query).get("format", ["json"])[0]
            if fmt == "npz":
                self._send(200, _to_npz_bytes(out), "application/x-npz")
            else:
                self._send_json(200, _to_jsonable(out))
            print(f"[serve] n={sizes.pop()} {ms:.1f} ms", flush=True)

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir (e.g. runs/x/checkpoints/best_model)")
    ap.add_argument("--kind", choices=sorted(REQUIRED_INPUTS), default=None,
                    help="predictor kind (default: sniffed from the meta)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--buckets", default="1,8,32",
                    help="comma-separated batch buckets (one XLA program each)")
    ap.add_argument("--warmup", action="store_true", default=True,
                    help="compile every bucket before accepting requests "
                         "(DEFAULT since round 5: a cold bucket compile "
                         "inside a live request is the worst tail-latency "
                         "mode a relay/TPU deployment has — multi-minute "
                         "p99; see measurements/bench_serving_r5.json "
                         "phase breakdown)")
    ap.add_argument("--no-warmup", dest="warmup", action="store_false",
                    help="skip bucket pre-compilation (fast startup for "
                         "debugging; first request per bucket pays the "
                         "compile)")
    ap.add_argument("--mesh", nargs="?", const="dp", default=None,
                    help="multi-chip serving: 'dp' shards request batches "
                         "over all local devices; 'dpN,tpM' also shards the "
                         "transformer matmuls (tensor parallel) to cut "
                         "per-request latency")
    ap.add_argument("--dynamic-batch", nargs="?", const=5.0, type=float,
                    default=None, metavar="MAX_WAIT_MS",
                    help="coalesce concurrent requests into one device "
                         "dispatch, waiting at most MAX_WAIT_MS (default 5) "
                         "for co-travelers — single-sample request storms "
                         "then share one dispatch instead of serializing")
    args = ap.parse_args(argv)

    ckpt = Path(args.checkpoint).resolve()
    kind = args.kind or sniff_kind(ckpt)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    print(f"[serve] restoring {kind!r} predictor from {ckpt}")
    predictor = build_predictor(kind, ckpt, buckets, mesh=args.mesh or False)
    if args.warmup:
        t0 = time.perf_counter()
        predictor.warmup()
        print(f"[serve] warmed {len(predictor.buckets)} buckets "
              f"in {time.perf_counter() - t0:.1f} s")

    batcher = None
    if args.dynamic_batch is not None:
        from eyegaze_tpu.serving import DynamicBatcher

        batcher = DynamicBatcher(predictor, max_wait_ms=args.dynamic_batch)
        print(f"[serve] dynamic batching: max_wait={args.dynamic_batch} ms, "
              f"max_batch={batcher.max_batch}")

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(kind, predictor, ckpt, batcher))
    print(f"[serve] listening on http://{args.host}:{server.server_address[1]} "
          f"(kind={kind}, buckets={list(buckets)})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        if batcher is not None:
            batcher.close()
    return server


if __name__ == "__main__":
    main()
