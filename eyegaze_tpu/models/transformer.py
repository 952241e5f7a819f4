"""Shared Flax transformer stack (post-LN, ReLU FFN).

TPU-native rebuild of the from-scratch torch blocks in
``3_Models/backbones/art.py``: MultiHeadAttention (:128-213), FeedForward
(:215-272), encoder/decoder blocks with post-LayerNorm residuals (:274-481),
and sinusoidal/learned positional embeddings (:55-126).

Design notes (TPU-first, not a translation):
- attention runs as one fused ``jax.nn.dot_product_attention`` call (XLA maps
  it onto the MXU; sequences here are short — 139 tokens EEG, 197 ViT — so no
  flash/splash kernel is needed);
- computation dtype is configurable (bf16 by default under training) with f32
  params and f32 softmax/LayerNorm accumulation, matching TPU best practice.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


class MultiHeadAttention(nn.Module):
    """Scaled dot-product multi-head attention with q/k/v/out projections.

    Mask convention matches art.py:207-208: positions where ``mask == 0`` are
    filled with -1e9 before the softmax.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, deterministic: bool = True,
                 return_weights: bool = False):
        assert self.d_model % self.num_heads == 0
        d_k = self.d_model // self.num_heads
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        b, tq = q.shape[0], q.shape[1]
        tk = k.shape[1]
        qh = dense("q_proj")(q).reshape(b, tq, self.num_heads, d_k)
        kh = dense("k_proj")(k).reshape(b, tk, self.num_heads, d_k)
        vh = dense("v_proj")(v).reshape(b, tk, self.num_heads, d_k)

        # (B, H, Tq, Tk) scores in f32 for a stable softmax.
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(d_k)
        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e9, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        context = jnp.einsum(
            "bhqk,bkhd->bqhd", attn.astype(self.dtype), vh,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        context = context.reshape(b, tq, self.d_model)
        out = dense("out_proj")(context)
        if return_weights:
            return out, attn
        return out


class FeedForward(nn.Module):
    """Linear -> ReLU -> Dropout -> Linear -> Dropout (art.py:249-272)."""

    d_model: int
    d_ff: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class TransformerEncoderBlock(nn.Module):
    """Post-LN encoder block: x = LN(x + drop(MHA)); x = LN(x + drop(FFN))."""

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        h = MultiHeadAttention(self.d_model, self.num_heads, self.attn_dropout,
                               dtype=self.dtype, name="mha")(
            x, x, x, attn_mask=attn_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ln1")(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic))
        h = FeedForward(self.d_model, self.d_ff, self.dropout, dtype=self.dtype,
                        name="ffn")(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="ln2")(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic))


class TransformerEncoder(nn.Module):
    """Stack of encoder blocks + final LayerNorm (art.py:298-328)."""

    d_model: int
    num_layers: int
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        for i in range(self.num_layers):
            x = TransformerEncoderBlock(
                self.d_model, self.num_heads, self.d_ff, self.dropout,
                self.attn_dropout, dtype=self.dtype, name=f"layer_{i}",
            )(x, attn_mask=attn_mask, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class TransformerDecoderBlock(nn.Module):
    """Post-LN decoder block: self-attn, cross-attn, FFN (art.py:375-413)."""

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, self_attn_mask=None, cross_attn_mask=None,
                 deterministic: bool = True):
        h = MultiHeadAttention(self.d_model, self.num_heads, self.attn_dropout,
                               dtype=self.dtype, name="self_mha")(
            x, x, x, attn_mask=self_attn_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ln1")(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic))
        h = MultiHeadAttention(self.d_model, self.num_heads, self.attn_dropout,
                               dtype=self.dtype, name="cross_mha")(
            x, memory, memory, attn_mask=cross_attn_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ln2")(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic))
        h = FeedForward(self.d_model, self.d_ff, self.dropout, dtype=self.dtype,
                        name="ffn")(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="ln3")(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic))


class TransformerDecoder(nn.Module):
    """Stack of decoder blocks + final LayerNorm (art.py:454-481)."""

    d_model: int
    num_layers: int
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, self_attn_mask=None, cross_attn_mask=None,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            x = TransformerDecoderBlock(
                self.d_model, self.num_heads, self.d_ff, self.dropout,
                self.attn_dropout, dtype=self.dtype, name=f"layer_{i}",
            )(x, memory, self_attn_mask, cross_attn_mask, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


def sinusoidal_position_table(max_len: int, d_model: int) -> np.ndarray:
    """Fixed sin/cos table (art.py:109-114)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class PositionalEmbedding(nn.Module):
    """Adds sinusoidal or learned positional information (art.py:55-126)."""

    max_len: int
    d_model: int
    mode: str = "sinusoidal"  # 'sinusoidal' | 'learned'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = x.shape[1]
        if self.mode == "learned":
            table = self.param(
                "pos_embed",
                nn.initializers.normal(stddev=1.0),
                (self.max_len, self.d_model),
            )
            pos = table[:t][None].astype(self.dtype)
        elif self.mode == "sinusoidal":
            pos = jnp.asarray(sinusoidal_position_table(self.max_len, self.d_model))[:t][
                None
            ].astype(self.dtype)
        else:
            raise ValueError(f"Unsupported pos_mode: {self.mode}")
        return x + pos
