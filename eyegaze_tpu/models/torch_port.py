"""Torch-checkpoint migration: reference state_dicts -> Flax param trees.

A user of the reference framework arrives with *trained* PyTorch checkpoints:
DualEEGTransformer (dual_eeg_transformer.py:977-1107), ArtifactRemovalTransformer
(art.py:566-601), and the timm-backed gaze models (early_fusion_vit.py:32-177,
late_fusion_vit.py:33-132). These porters map every parameter tensor into this
framework's Flax trees so those checkpoints can be served, analyzed, and
fine-tuned on TPU without retraining. The CLI wrapper is
``scripts/import_torch_checkpoint.py``, which also stamps the checkpoint meta
that ``eyegaze_tpu.serving`` reconstructs models from.

Every porter is STRICT in both directions: it fails if a torch parameter is
left unconsumed (mapping drift / wrong architecture) or a Flax leaf is left
unwritten (missing weights would silently serve garbage). Known torch buffers
(sinusoidal ``pe`` tables, the STFT Hann ``window``) are skipped by name.

Layout conventions (torch -> flax):
- ``nn.Linear``    weight (out, in)        -> Dense kernel (in, out): transpose
- ``nn.Conv1d``    weight (out, in, k)     -> Conv kernel (k, in, out)
- ``nn.Conv2d``    weight (out, in, kh, kw)-> Conv kernel (kh, kw, in, out)
- ``nn.LayerNorm`` / affine InstanceNorm1d  weight/bias -> scale/bias
- ``nn.Embedding`` weight (n, d)           -> table (n, d): NO transpose
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "port_dual_eeg_state_dict",
    "port_art_state_dict",
    "port_gaze_early_state_dict",
    "port_gaze_late_state_dict",
    "port_multimodal_state_dict",
    "export_dual_eeg_state_dict",
    "export_art_state_dict",
    "export_gaze_early_state_dict",
    "export_gaze_late_state_dict",
    "export_multimodal_state_dict",
    "strip_prefix",
]

# torch buffers that carry no learned state (never ported):
_BUFFER_SUFFIXES = (
    ".pe",  # sinusoidal PositionalEmbedding table (art.py:112-114)
    ".window",  # STFT Hann window (dual_eeg_transformer.py:69)
    ".num_batches_tracked",
    ".running_mean",
    ".running_var",
)


def strip_prefix(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Return the sub-dict under ``prefix.`` with the prefix removed.

    Also strips a leading ``module.`` (torch DataParallel wrapping) first.
    """
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith(prefix + "."):
            out[k[len(prefix) + 1:]] = v
    return out


def _is_buffer(key: str) -> bool:
    return any(key.endswith(s) for s in _BUFFER_SUFFIXES)


class _Porter:
    """Tracks consumption of torch keys and coverage of flax leaves."""

    def __init__(self, params: dict, state: Dict[str, np.ndarray]):
        # numpy-copy the template so puts can assert against real shapes
        self.params = jax.tree_util.tree_map(np.asarray, params)
        self.state = {k: np.asarray(v) for k, v in state.items()}
        self.consumed: set = set()
        self.written: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.state:
            raise KeyError(
                f"torch state_dict has no key {key!r} — wrong architecture "
                "or ablation flags for this checkpoint?")
        self.consumed.add(key)
        return self.state[key]

    def put(self, path: Sequence[str], value: np.ndarray) -> None:
        node = self.params
        for k in path[:-1]:
            node = node[k]
        have = node[path[-1]]
        if have.shape != value.shape:
            raise ValueError(
                f"{'/'.join(path)}: flax expects {have.shape}, "
                f"torch checkpoint provides {value.shape}")
        node[path[-1]] = np.asarray(value, dtype=np.float32)
        self.written.add("/".join(path))

    # -- module-level helpers -------------------------------------------
    def linear(self, tkey: str, fpath: Sequence[str]) -> None:
        self.put(list(fpath) + ["kernel"], self.take(tkey + ".weight").T)
        self.put(list(fpath) + ["bias"], self.take(tkey + ".bias"))

    def norm(self, tkey: str, fpath: Sequence[str]) -> None:
        self.put(list(fpath) + ["scale"], self.take(tkey + ".weight"))
        self.put(list(fpath) + ["bias"], self.take(tkey + ".bias"))

    def conv1d(self, tkey: str, fpath: Sequence[str]) -> None:
        w = self.take(tkey + ".weight")  # (O, I, K)
        self.put(list(fpath) + ["kernel"], np.transpose(w, (2, 1, 0)))
        self.put(list(fpath) + ["bias"], self.take(tkey + ".bias"))

    def conv2d(self, tkey: str, fpath: Sequence[str]) -> None:
        w = self.take(tkey + ".weight")  # (O, I, kh, kw)
        self.put(list(fpath) + ["kernel"], np.transpose(w, (2, 3, 1, 0)))
        self.put(list(fpath) + ["bias"], self.take(tkey + ".bias"))

    def mha(self, tprefix: str, fpath: Sequence[str]) -> None:
        """art.py MultiHeadAttention (:176-179): separate q/k/v/out Linears —
        the same decomposition as models/transformer.py, so this is 4 linears."""
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            self.linear(f"{tprefix}.{name}", list(fpath) + [name])

    def encoder(self, tprefix: str, fpath: Sequence[str], num_layers: int) -> None:
        """art.py TransformerEncoder (:298-328) -> models.transformer.TransformerEncoder."""
        for i in range(num_layers):
            tp, fp = f"{tprefix}.layers.{i}", list(fpath) + [f"layer_{i}"]
            self.mha(f"{tp}.mha", fp + ["mha"])
            self.norm(f"{tp}.ln1", fp + ["ln1"])
            self.linear(f"{tp}.ffn.linear1", fp + ["ffn", "linear1"])
            self.linear(f"{tp}.ffn.linear2", fp + ["ffn", "linear2"])
            self.norm(f"{tp}.ln2", fp + ["ln2"])
        self.norm(f"{tprefix}.norm", list(fpath) + ["norm"])

    def decoder(self, tprefix: str, fpath: Sequence[str], num_layers: int) -> None:
        """art.py TransformerDecoder (:415-481) -> models.transformer.TransformerDecoder."""
        for i in range(num_layers):
            tp, fp = f"{tprefix}.layers.{i}", list(fpath) + [f"layer_{i}"]
            self.mha(f"{tp}.self_mha", fp + ["self_mha"])
            self.norm(f"{tp}.ln1", fp + ["ln1"])
            self.mha(f"{tp}.cross_mha", fp + ["cross_mha"])
            self.norm(f"{tp}.ln2", fp + ["ln2"])
            self.linear(f"{tp}.ffn.linear1", fp + ["ffn", "linear1"])
            self.linear(f"{tp}.ffn.linear2", fp + ["ffn", "linear2"])
            self.norm(f"{tp}.ln3", fp + ["ln3"])
        self.norm(f"{tprefix}.norm", list(fpath) + ["norm"])

    def finish(self) -> dict:
        leftover = sorted(k for k in self.state
                          if k not in self.consumed and not _is_buffer(k))
        if leftover:
            raise ValueError(
                f"unconsumed torch parameters (mapping drift?): {leftover[:8]}"
                + ("..." if len(leftover) > 8 else ""))
        missing = []
        for path, _ in jax.tree_util.tree_flatten_with_path(self.params)[0]:
            name = "/".join(p.key for p in path)
            if name not in self.written:
                missing.append(name)
        if missing:
            raise ValueError(
                f"flax leaves never written by the port: {sorted(missing)[:8]}")
        return jax.tree_util.tree_map(jnp.asarray, self.params)


def _num_layers(tree: dict) -> int:
    return sum(1 for k in tree if k.startswith("layer_"))


def port_dual_eeg_state_dict(params: dict, state: Dict[str, np.ndarray]) -> dict:
    """Port a reference DualEEGTransformer state_dict into the Flax tree.

    ``params`` is the target template from ``DualEEGTransformer(...).init``
    — its structure (which ablation submodules exist, layer count) must match
    the checkpoint's training config; mismatches fail loudly in both
    directions. Reference module names: dual_eeg_transformer.py:1040-1107.
    """
    p = _Porter(params, state)
    fp = p.params

    # Siamese temporal frontend (:151-158 convs ModuleList)
    for i in range(sum(1 for k in fp["temporal_conv"] if k.startswith("conv_"))):
        p.conv1d(f"temporal_conv.convs.{i}", ["temporal_conv", f"conv_{i}"])

    if "spectrogram_generator" in fp:
        # spec_conv Sequential: [Conv2d, ReLU, MaxPool, Conv2d, ReLU, Adaptive]
        p.conv2d("spectrogram_generator.spec_conv.0",
                 ["spectrogram_generator", "conv1"])
        p.conv2d("spectrogram_generator.spec_conv.3",
                 ["spectrogram_generator", "conv2"])
        # proj Sequential: [Linear, ReLU, Dropout, Linear] (:81-87)
        p.linear("spectrogram_generator.proj.0",
                 ["spectrogram_generator", "proj1"])
        p.linear("spectrogram_generator.proj.3",
                 ["spectrogram_generator", "proj2"])

    if "ibs_tokenizer" in fp:  # robust IBS path (:822-911)
        if "in_scale" in fp["ibs_tokenizer"]:
            p.put(["ibs_tokenizer", "in_scale"],
                  p.take("ibs_tokenizer.instance_norm.weight"))
            p.put(["ibs_tokenizer", "in_bias"],
                  p.take("ibs_tokenizer.instance_norm.bias"))
        p.linear("ibs_tokenizer.bottleneck.0", ["ibs_tokenizer", "bottleneck1"])
        p.linear("ibs_tokenizer.bottleneck.3", ["ibs_tokenizer", "bottleneck2"])
        p.put(["ibs_tokenizer", "type_embedding"],
              p.take("ibs_tokenizer.type_embedding")[0])  # (1, n, d) -> (n, d)
    if "ibs_generator" in fp:  # legacy scalar IBS path (:178-227)
        p.linear("ibs_generator.proj.0", ["ibs_generator", "proj1"])
        p.linear("ibs_generator.proj.3", ["ibs_generator", "proj2"])
        if "norm" in fp["ibs_generator"]:
            p.norm("ibs_generator.norm", ["ibs_generator", "norm"])
    if "ibs_classifier_1" in fp:  # Sequential [Linear, ReLU, Dropout, Linear]
        p.linear("ibs_classifier.0", ["ibs_classifier_1"])
        p.linear("ibs_classifier.3", ["ibs_classifier_2"])

    p.put(["cls_token"], p.take("cls_token"))
    # learned PositionalEmbedding = nn.Embedding (art.py:107): no transpose
    p.put(["pos_embed", "pos_embed"], p.take("pos_embed.pos_embed.weight"))

    p.encoder("encoder", ["encoder"], _num_layers(fp["encoder"]))

    if "cross_attn" in fp:  # CrossBrainAttention (:944-953)
        p.mha("cross_attn.cross_attn", ["cross_attn", "cross_attn"])
        p.norm("cross_attn.norm", ["cross_attn", "norm"])

    p.linear("symmetric_fusion.proj", ["symmetric_fusion", "proj"])
    p.linear("classifier.0", ["classifier_1"])  # Sequential (:1100-1105)
    p.linear("classifier.3", ["classifier_2"])
    return p.finish()


def port_art_state_dict(params: dict, state: Dict[str, np.ndarray]) -> dict:
    """Port a reference ArtifactRemovalTransformer state_dict (art.py:566-601).

    src/tgt embeds are Sequential[ExpandConv1x1, PositionalEmbedding, Dropout];
    the 1x1 Conv1d (art.py:47) is a Dense over the channel axis here, so its
    (E, C, 1) kernel squeezes to a (C, E) Dense kernel. Sinusoidal positional
    tables are buffers and skipped; learned mode ports the embedding table.
    """
    p = _Porter(params, state)
    fp = p.params

    for side in ("src", "tgt"):
        w = p.take(f"{side}_embed.0.conv.weight")  # (E, C, 1)
        p.put([f"{side}_embed", "conv", "kernel"], w[:, :, 0].T)
        p.put([f"{side}_embed", "conv", "bias"],
              p.take(f"{side}_embed.0.conv.bias"))
        if f"{side}_pos" in fp:  # pos_mode='learned' only
            p.put([f"{side}_pos", "pos_embed"],
                  p.take(f"{side}_embed.1.pos_embed.weight"))

    p.encoder("encoder", ["encoder"], _num_layers(fp["encoder"]))
    p.decoder("decoder", ["decoder"], _num_layers(fp["decoder"]))
    p.linear("reconstructor.proj", ["reconstructor", "proj"])
    return p.finish()


def port_gaze_early_state_dict(params: dict, state: Dict[str, np.ndarray]) -> dict:
    """Port a reference EarlyFusionViT checkpoint (early_fusion_vit.py:32-177).

    The reference wraps a timm ViT under ``backbone.`` (with the concat mode's
    6-channel patch-embed surgery already applied in the trained weights and
    the head already sized to num_classes), so this strips the prefix and
    reuses the timm porter — which accepts the 6-channel kernel as-is.
    """
    from eyegaze_tpu.models.vit import load_timm_state_dict

    return load_timm_state_dict(params, strip_prefix(state, "backbone"),
                                backbone_key="backbone")


_FUZZY_PARAMS = (
    "tau_img", "tau_eeg", "c_unreliable_img", "c_unreliable_eeg",
    "log_sigma_reliable_img", "log_sigma_reliable_eeg",
    "log_sigma_unreliable_img", "log_sigma_unreliable_eeg", "beta",
)


def port_multimodal_state_dict(params: dict, state: Dict[str, np.ndarray]) -> dict:
    """Port a reference MultimodalFusionModel checkpoint
    (train_multimodal_fuzzy_fusion.py:106-179): ``gaze_encoder.`` wraps an
    EarlyFusionViT, ``eeg_encoder.`` a DualEEGTransformer, ``fusion.`` the
    FuzzyGatingFusion whose parameter NAMES are the contract on both sides
    (fuzzy_gating_fusion.py:88-121 / models/fuzzy_fusion.py) — direct copies.
    The ``fusion.c_reliable`` buffer (a constant 0.0) is skipped.
    """
    params = jax.tree_util.tree_map(np.asarray, dict(params))
    params["gaze_encoder"] = port_gaze_early_state_dict(
        params["gaze_encoder"], strip_prefix(state, "gaze_encoder"))
    params["eeg_encoder"] = port_dual_eeg_state_dict(
        params["eeg_encoder"], strip_prefix(state, "eeg_encoder"))
    fused = dict(params["fusion"])
    for name in _FUZZY_PARAMS:
        want = np.shape(fused[name])
        got = np.asarray(state[f"fusion.{name}"], dtype=np.float32)
        if np.shape(got) != want:
            raise ValueError(f"fusion/{name}: {want} vs {np.shape(got)}")
        fused[name] = got
    params["fusion"] = fused
    extra = sorted(k for k in state if k.startswith("fusion.")
                   and k.split(".", 1)[1] not in _FUZZY_PARAMS
                   and not _is_buffer(k) and k != "fusion.c_reliable")
    if extra:
        raise ValueError(f"unconsumed fusion parameters: {extra}")
    return jax.tree_util.tree_map(jnp.asarray, params)


def port_gaze_late_state_dict(params: dict, state: Dict[str, np.ndarray]) -> dict:
    """Port a reference LateFusionViT checkpoint (late_fusion_vit.py:33-132).

    The Siamese timm encoder lives under ``encoder.`` (created with
    num_classes=0, so it has no head); the fusion classifier is a root-level
    Linear.
    """
    from eyegaze_tpu.models.vit import load_timm_state_dict

    params = load_timm_state_dict(params, strip_prefix(state, "encoder"),
                                  backbone_key="encoder")
    params = jax.tree_util.tree_map(np.asarray, params)
    cw, cb = np.asarray(state["classifier.weight"]), np.asarray(state["classifier.bias"])
    if params["classifier"]["kernel"].shape != cw.T.shape:
        raise ValueError(
            f"classifier: flax expects {params['classifier']['kernel'].shape}, "
            f"torch provides {cw.T.shape} — fusion_mode mismatch?")
    params["classifier"]["kernel"] = cw.T.astype(np.float32)
    params["classifier"]["bias"] = cb.astype(np.float32)
    return jax.tree_util.tree_map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Reverse direction: Flax param trees -> reference torch state_dicts
# ---------------------------------------------------------------------------

class _Exporter:
    """Mirror of _Porter: reads flax leaves, emits torch-named tensors."""

    def __init__(self, params: dict):
        self.params = jax.tree_util.tree_map(np.asarray, params)
        self.state: Dict[str, np.ndarray] = {}

    def get(self, path: Sequence[str]) -> np.ndarray:
        node = self.params
        for k in path:
            node = node[k]
        return np.asarray(node, dtype=np.float32)

    def put(self, key: str, value: np.ndarray) -> None:
        self.state[key] = np.ascontiguousarray(value, dtype=np.float32)

    def linear(self, tkey: str, fpath: Sequence[str]) -> None:
        self.put(tkey + ".weight", self.get(list(fpath) + ["kernel"]).T)
        self.put(tkey + ".bias", self.get(list(fpath) + ["bias"]))

    def norm(self, tkey: str, fpath: Sequence[str]) -> None:
        self.put(tkey + ".weight", self.get(list(fpath) + ["scale"]))
        self.put(tkey + ".bias", self.get(list(fpath) + ["bias"]))

    def conv1d(self, tkey: str, fpath: Sequence[str]) -> None:
        w = self.get(list(fpath) + ["kernel"])  # (K, I, O)
        self.put(tkey + ".weight", np.transpose(w, (2, 1, 0)))
        self.put(tkey + ".bias", self.get(list(fpath) + ["bias"]))

    def conv2d(self, tkey: str, fpath: Sequence[str]) -> None:
        w = self.get(list(fpath) + ["kernel"])  # (kh, kw, I, O)
        self.put(tkey + ".weight", np.transpose(w, (3, 2, 0, 1)))
        self.put(tkey + ".bias", self.get(list(fpath) + ["bias"]))

    def mha(self, tprefix: str, fpath: Sequence[str]) -> None:
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            self.linear(f"{tprefix}.{name}", list(fpath) + [name])

    def encoder(self, tprefix: str, fpath: Sequence[str], num_layers: int) -> None:
        for i in range(num_layers):
            tp, fp = f"{tprefix}.layers.{i}", list(fpath) + [f"layer_{i}"]
            self.mha(f"{tp}.mha", fp + ["mha"])
            self.norm(f"{tp}.ln1", fp + ["ln1"])
            self.linear(f"{tp}.ffn.linear1", fp + ["ffn", "linear1"])
            self.linear(f"{tp}.ffn.linear2", fp + ["ffn", "linear2"])
            self.norm(f"{tp}.ln2", fp + ["ln2"])
        self.norm(f"{tprefix}.norm", list(fpath) + ["norm"])

    def decoder(self, tprefix: str, fpath: Sequence[str], num_layers: int) -> None:
        for i in range(num_layers):
            tp, fp = f"{tprefix}.layers.{i}", list(fpath) + [f"layer_{i}"]
            self.mha(f"{tp}.self_mha", fp + ["self_mha"])
            self.norm(f"{tp}.ln1", fp + ["ln1"])
            self.mha(f"{tp}.cross_mha", fp + ["cross_mha"])
            self.norm(f"{tp}.ln2", fp + ["ln2"])
            self.linear(f"{tp}.ffn.linear1", fp + ["ffn", "linear1"])
            self.linear(f"{tp}.ffn.linear2", fp + ["ffn", "linear2"])
            self.norm(f"{tp}.ln3", fp + ["ln3"])
        self.norm(f"{tprefix}.norm", list(fpath) + ["norm"])


def export_dual_eeg_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_dual_eeg_state_dict`: a torch state_dict the
    reference DualEEGTransformer loads with ``strict=False`` (its registered
    buffers — the STFT Hann window and any sinusoidal tables — are
    deterministic constructor constants, correctly re-created on the torch
    side, so parameter-only export is lossless)."""
    e = _Exporter(params)
    fp = e.params

    for i in range(sum(1 for k in fp["temporal_conv"] if k.startswith("conv_"))):
        e.conv1d(f"temporal_conv.convs.{i}", ["temporal_conv", f"conv_{i}"])
    if "spectrogram_generator" in fp:
        e.conv2d("spectrogram_generator.spec_conv.0",
                 ["spectrogram_generator", "conv1"])
        e.conv2d("spectrogram_generator.spec_conv.3",
                 ["spectrogram_generator", "conv2"])
        e.linear("spectrogram_generator.proj.0",
                 ["spectrogram_generator", "proj1"])
        e.linear("spectrogram_generator.proj.3",
                 ["spectrogram_generator", "proj2"])
    if "ibs_tokenizer" in fp:
        if "in_scale" in fp["ibs_tokenizer"]:
            e.put("ibs_tokenizer.instance_norm.weight",
                  e.get(["ibs_tokenizer", "in_scale"]))
            e.put("ibs_tokenizer.instance_norm.bias",
                  e.get(["ibs_tokenizer", "in_bias"]))
        e.linear("ibs_tokenizer.bottleneck.0", ["ibs_tokenizer", "bottleneck1"])
        e.linear("ibs_tokenizer.bottleneck.3", ["ibs_tokenizer", "bottleneck2"])
        e.put("ibs_tokenizer.type_embedding",
              e.get(["ibs_tokenizer", "type_embedding"])[None])
    if "ibs_generator" in fp:
        e.linear("ibs_generator.proj.0", ["ibs_generator", "proj1"])
        e.linear("ibs_generator.proj.3", ["ibs_generator", "proj2"])
        if "norm" in fp["ibs_generator"]:
            e.norm("ibs_generator.norm", ["ibs_generator", "norm"])
    if "ibs_classifier_1" in fp:
        e.linear("ibs_classifier.0", ["ibs_classifier_1"])
        e.linear("ibs_classifier.3", ["ibs_classifier_2"])
    e.put("cls_token", e.get(["cls_token"]))
    e.put("pos_embed.pos_embed.weight", e.get(["pos_embed", "pos_embed"]))
    e.encoder("encoder", ["encoder"], _num_layers(fp["encoder"]))
    if "cross_attn" in fp:
        e.mha("cross_attn.cross_attn", ["cross_attn", "cross_attn"])
        e.norm("cross_attn.norm", ["cross_attn", "norm"])
    e.linear("symmetric_fusion.proj", ["symmetric_fusion", "proj"])
    e.linear("classifier.0", ["classifier_1"])
    e.linear("classifier.3", ["classifier_2"])
    return e.state


def export_art_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_art_state_dict` (parameter-only; sinusoidal
    ``pe`` buffers are constructor constants on the torch side)."""
    e = _Exporter(params)
    fp = e.params
    for side in ("src", "tgt"):
        w = e.get([f"{side}_embed", "conv", "kernel"])  # (C, E)
        e.put(f"{side}_embed.0.conv.weight", w.T[:, :, None])
        e.put(f"{side}_embed.0.conv.bias",
              e.get([f"{side}_embed", "conv", "bias"]))
        if f"{side}_pos" in fp:
            e.put(f"{side}_embed.1.pos_embed.weight",
                  e.get([f"{side}_pos", "pos_embed"]))
    e.encoder("encoder", ["encoder"], _num_layers(fp["encoder"]))
    e.decoder("decoder", ["decoder"], _num_layers(fp["decoder"]))
    e.linear("reconstructor.proj", ["reconstructor", "proj"])
    return e.state


def _export_timm_backbone(e: _Exporter, prefix: str, tree: dict) -> None:
    """Inverse of load_timm_state_dict for one ViT backbone subtree."""
    p = f"{prefix}." if prefix else ""
    kernel = tree["patch_embed"]["kernel"]  # (kh, kw, C, E)
    e.state[p + "patch_embed.proj.weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(kernel, np.float32), (3, 2, 0, 1)))
    e.state[p + "patch_embed.proj.bias"] = np.asarray(
        tree["patch_embed"]["bias"], np.float32)
    e.state[p + "cls_token"] = np.asarray(tree["cls_token"], np.float32)
    e.state[p + "pos_embed"] = np.asarray(tree["pos_embed"], np.float32)
    e.state[p + "norm.weight"] = np.asarray(tree["norm"]["scale"], np.float32)
    e.state[p + "norm.bias"] = np.asarray(tree["norm"]["bias"], np.float32)
    depth = sum(1 for k in tree if k.startswith("block_"))
    for i in range(depth):
        blk = tree[f"block_{i}"]
        b = f"{p}blocks.{i}."
        for ln in ("norm1", "norm2"):
            e.state[b + ln + ".weight"] = np.asarray(blk[ln]["scale"], np.float32)
            e.state[b + ln + ".bias"] = np.asarray(blk[ln]["bias"], np.float32)
        embed = np.asarray(tree["cls_token"]).shape[-1]
        qkv_w, qkv_b = [], []
        for name in ("query", "key", "value"):
            k = np.asarray(blk["attn"][name]["kernel"], np.float32)
            qkv_w.append(k.reshape(embed, embed).T)  # (E, H, hd) -> (E, E)
            qkv_b.append(np.asarray(blk["attn"][name]["bias"],
                                    np.float32).reshape(embed))
        e.state[b + "attn.qkv.weight"] = np.ascontiguousarray(
            np.concatenate(qkv_w, axis=0))
        e.state[b + "attn.qkv.bias"] = np.concatenate(qkv_b, axis=0)
        out_k = np.asarray(blk["attn"]["out"]["kernel"], np.float32)
        e.state[b + "attn.proj.weight"] = np.ascontiguousarray(
            out_k.reshape(embed, embed).T)
        e.state[b + "attn.proj.bias"] = np.asarray(blk["attn"]["out"]["bias"],
                                                   np.float32)
        for fc in ("fc1", "fc2"):
            e.state[b + f"mlp.{fc}.weight"] = np.ascontiguousarray(
                np.asarray(blk["mlp"][fc]["kernel"], np.float32).T)
            e.state[b + f"mlp.{fc}.bias"] = np.asarray(blk["mlp"][fc]["bias"],
                                                       np.float32)
    if "head" in tree:
        e.state[p + "head.weight"] = np.ascontiguousarray(
            np.asarray(tree["head"]["kernel"], np.float32).T)
        e.state[p + "head.bias"] = np.asarray(tree["head"]["bias"], np.float32)


def export_gaze_early_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_gaze_early_state_dict` (``backbone.``-prefixed
    timm naming, 6-channel concat kernel exported as trained)."""
    e = _Exporter(params)
    _export_timm_backbone(e, "backbone", e.params["backbone"])
    return e.state


def export_gaze_late_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_gaze_late_state_dict`."""
    e = _Exporter(params)
    _export_timm_backbone(e, "encoder", e.params["encoder"])
    e.linear("classifier", ["classifier"])
    return e.state


def export_multimodal_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_multimodal_state_dict`."""
    params = jax.tree_util.tree_map(np.asarray, dict(params))
    state: Dict[str, np.ndarray] = {}
    for k, v in export_gaze_early_state_dict(params["gaze_encoder"]).items():
        state[f"gaze_encoder.{k}"] = v
    for k, v in export_dual_eeg_state_dict(params["eeg_encoder"]).items():
        state[f"eeg_encoder.{k}"] = v
    for name in _FUZZY_PARAMS:
        state[f"fusion.{name}"] = np.asarray(params["fusion"][name],
                                             np.float32)
    return state
