"""Vision Transformer (ViT-B/16 default) + early/late gaze-pair fusion heads.

TPU-native rebuild of ``3_Models/backbones/early_fusion_vit.py`` and
``late_fusion_vit.py``.  The backbone is a standard pre-norm ViT (timm
``vit_base_patch16_224`` architecture: patch-embed conv, CLS token, learned
positional embedding, 12 x [LN->MHA->residual, LN->GELU-MLP->residual], final
LN), implemented directly in Flax.

Pretrained weights: timm downloads are unavailable in this environment, so
``load_timm_state_dict`` ports a locally provided timm/torch state dict (as a
dict of numpy arrays, e.g. from an .npz file) into the Flax parameter tree —
including the 6-channel patch-embed surgery with 'duplicate'/'average' init
(early_fusion_vit.py:103-147).  All models run with random init otherwise
(the reference supports pretrained=False the same way, analyze_gaze.py:215).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype

EARLY_FUSION_MODES = ("concat", "add", "subtract", "subtract_abs", "multiply")
LATE_FUSION_MODES = ("concat", "add", "subtract", "multiply", "full")


class ViTMlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ViTBlock(nn.Module):
    """Pre-norm transformer block (timm ViT parity)."""

    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
            name="attn",
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = ViTMlp(int(self.embed_dim * self.mlp_ratio), self.embed_dim,
                   self.dropout, dtype=self.dtype, name="mlp")(h, deterministic)
        return x + h


class VisionTransformer(nn.Module):
    """ViT backbone; ``num_classes=0`` returns the CLS feature (timm parity)."""

    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 3
    dropout: float = 0.0
    enable_perturb: bool = False  # expose last-block tokens for Grad-CAM
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_features: bool = False):
        """x: (B, C, H, W) channel-first (reference data layout)."""
        b = x.shape[0]
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        h = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(h)
        n_patches = (self.img_size // self.patch_size) ** 2
        h = h.reshape(b, n_patches, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(self.dtype), h], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02),
            (1, n_patches + 1, self.embed_dim),
        )
        h = h + pos.astype(self.dtype)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        for i in range(self.depth):
            h = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         self.dropout, dtype=self.dtype, name=f"block_{i}")(h, deterministic)
        if self.enable_perturb:
            # Grad-CAM target: gradient w.r.t. the last block's patch tokens
            # (the JAX equivalent of hooking backbone.blocks[-1],
            # 6_Utils/attention_utils.py:166-255).
            h = self.perturb("last_block", h)
            self.sow("intermediates", "last_block_tokens", h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        cls_feat = h[:, 0, :]
        if return_features or self.num_classes == 0:
            return cls_feat.astype(jnp.float32)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(cls_feat)
        return logits.astype(jnp.float32)


def fuse_images(img_a: jnp.ndarray, img_b: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Input-level fusion of two (B, 3, H, W) images (early_fusion_vit.py:149-196)."""
    if mode == "concat":
        return jnp.concatenate([img_a, img_b], axis=1)
    if mode == "add":
        return (img_a + img_b) / 2.0
    if mode == "subtract":
        return (img_a - img_b) / 2.0
    if mode == "subtract_abs":
        return jnp.abs(img_a - img_b)
    if mode == "multiply":
        prod = img_a * img_b
        b, c = prod.shape[:2]
        flat = prod.reshape(b, c, -1)
        mean = jnp.mean(flat, axis=2, keepdims=True)
        var = jnp.sum((flat - mean) ** 2, axis=2, keepdims=True) / (flat.shape[2] - 1)
        return ((flat - mean) / (jnp.sqrt(var) + 1e-6)).reshape(prod.shape)
    raise ValueError(f"fusion_mode must be one of {EARLY_FUSION_MODES}, got {mode!r}")


class EarlyFusionViT(nn.Module):
    """Input-level gaze-pair fusion -> ViT (early_fusion_vit.py:32-242)."""

    num_classes: int = 3
    img_size: int = 224
    fusion_mode: str = "concat"
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    dropout: float = 0.0
    enable_perturb: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_a, img_b, deterministic: bool = True,
                 return_features: bool = False):
        if self.fusion_mode not in EARLY_FUSION_MODES:
            raise ValueError(f"bad fusion_mode {self.fusion_mode!r}")
        fused = fuse_images(img_a, img_b, self.fusion_mode)
        in_ch = 6 if self.fusion_mode == "concat" else 3
        backbone = VisionTransformer(
            img_size=self.img_size, in_channels=in_ch, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads, num_classes=self.num_classes,
            dropout=self.dropout, enable_perturb=self.enable_perturb,
            dtype=self.dtype, name="backbone",
        )
        return backbone(fused, deterministic=deterministic, return_features=return_features)


class LateFusionViT(nn.Module):
    """Siamese shared ViT encoder + decision-level CLS fusion (late_fusion_vit.py:33-252)."""

    num_classes: int = 3
    img_size: int = 224
    fusion_mode: str = "full"
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    def _fuse(self, cls1, cls2):
        if self.fusion_mode == "concat":
            return jnp.concatenate([cls1, cls2], axis=1)
        if self.fusion_mode == "add":
            return cls1 + cls2
        if self.fusion_mode == "subtract":
            return cls1 - cls2
        if self.fusion_mode == "multiply":
            return cls1 * cls2
        if self.fusion_mode == "full":
            return jnp.concatenate(
                [cls1, cls2, cls1 - cls2, cls1 * cls2], axis=1)  # (B, 4D)
        raise ValueError(f"fusion_mode must be one of {LATE_FUSION_MODES}")

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True, return_features: bool = False):
        encoder = VisionTransformer(
            img_size=self.img_size, embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, num_classes=0, dtype=self.dtype, name="encoder",
        )
        cls1 = encoder(x1, deterministic=deterministic)
        cls2 = encoder(x2, deterministic=deterministic)
        fused = self._fuse(cls1, cls2)
        if return_features:
            return {"cls1": cls1, "cls2": cls2, "fused": fused}
        fused = nn.Dropout(self.dropout)(fused, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(fused)
        return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# timm weight porting
# ---------------------------------------------------------------------------

def load_timm_state_dict(
    params: dict,
    state: dict[str, np.ndarray],
    backbone_key: str = "backbone",
    weight_init_strategy: str = "duplicate",
) -> dict:
    """Port a timm ``vit_base_patch16_224`` state dict into a Flax param tree.

    ``state`` maps timm names -> numpy arrays (load an .npz of the torch
    state dict).  If the target patch-embed expects 6 input channels, the
    3-channel kernel is widened with the reference's init rule
    (early_fusion_vit.py:133-146): 'duplicate' copies the RGB kernel into
    both halves; 'average' fills the second half with the channel mean.
    """
    params = jax.tree_util.tree_map(np.asarray, params)
    tgt = params[backbone_key] if backbone_key else params

    def put(path, value):
        node = tgt
        for k in path[:-1]:
            node = node[k]
        assert node[path[-1]].shape == value.shape, (
            f"{path}: {node[path[-1]].shape} vs {value.shape}")
        node[path[-1]] = value.astype(np.float32)

    # Patch embed: torch (E, C, kh, kw) -> flax (kh, kw, C, E).
    w = state["patch_embed.proj.weight"]
    kernel = np.transpose(w, (2, 3, 1, 0))
    tgt_kernel = tgt["patch_embed"]["kernel"]
    if tgt_kernel.shape[2] == 6 and kernel.shape[2] == 3:
        widened = np.zeros_like(tgt_kernel)
        widened[:, :, 0:3] = kernel
        if weight_init_strategy == "duplicate":
            widened[:, :, 3:6] = kernel
        elif weight_init_strategy == "average":
            widened[:, :, 3:6] = kernel.mean(axis=2, keepdims=True)
        else:
            raise ValueError(weight_init_strategy)
        kernel = widened
    put(["patch_embed", "kernel"], kernel)
    put(["patch_embed", "bias"], state["patch_embed.proj.bias"])
    put(["cls_token"], state["cls_token"])
    put(["pos_embed"], state["pos_embed"])
    put(["norm", "scale"], state["norm.weight"])
    put(["norm", "bias"], state["norm.bias"])

    depth = sum(1 for k in tgt if k.startswith("block_"))
    embed_dim = state["cls_token"].shape[-1]
    num_heads = tgt["block_0"]["attn"]["query"]["kernel"].shape[1] if "attn" in tgt["block_0"] else 12
    head_dim = embed_dim // num_heads
    for i in range(depth):
        p = f"blocks.{i}."
        blk = ["block_%d" % i]
        put(blk + ["norm1", "scale"], state[p + "norm1.weight"])
        put(blk + ["norm1", "bias"], state[p + "norm1.bias"])
        put(blk + ["norm2", "scale"], state[p + "norm2.weight"])
        put(blk + ["norm2", "bias"], state[p + "norm2.bias"])
        qkv_w = state[p + "attn.qkv.weight"]  # (3E, E)
        qkv_b = state[p + "attn.qkv.bias"]
        qw, kw_, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        for name, wq, bq in (("query", qw, qb), ("key", kw_, kb), ("value", vw, vb)):
            put(blk + ["attn", name, "kernel"],
                wq.T.reshape(embed_dim, num_heads, head_dim))
            put(blk + ["attn", name, "bias"], bq.reshape(num_heads, head_dim))
        put(blk + ["attn", "out", "kernel"],
            state[p + "attn.proj.weight"].T.reshape(num_heads, head_dim, embed_dim))
        put(blk + ["attn", "out", "bias"], state[p + "attn.proj.bias"])
        put(blk + ["mlp", "fc1", "kernel"], state[p + "mlp.fc1.weight"].T)
        put(blk + ["mlp", "fc1", "bias"], state[p + "mlp.fc1.bias"])
        put(blk + ["mlp", "fc2", "kernel"], state[p + "mlp.fc2.weight"].T)
        put(blk + ["mlp", "fc2", "bias"], state[p + "mlp.fc2.bias"])

    if "head.weight" in state and "head" in tgt:
        if tgt["head"]["kernel"].shape == state["head.weight"].T.shape:
            put(["head", "kernel"], state["head.weight"].T)
            put(["head", "bias"], state["head.bias"])

    return jax.tree_util.tree_map(jnp.asarray, params)
