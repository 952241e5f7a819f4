"""ART — Artifact Removal Transformer (EEG denoising seq2seq), in Flax.

Rebuild of ``3_Models/backbones/art.py:483-658``: 1x1-conv channel embedding,
positional embedding, post-LN encoder/decoder, linear Reconstructor head with
optional log-softmax and batch/time z-score, and the HF-wrapper losses
(plain MSE or per-channel z-scored MSE).  The HF ``PretrainedConfig`` becomes
a plain dataclass (``ArtConfig``) with the same fields/defaults
(``3_Models/backbones/hf_config.py:8-44``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from eyegaze_tpu.models.transformer import (
    PositionalEmbedding,
    TransformerDecoder,
    TransformerEncoder,
)

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class ArtConfig:
    """Field/default parity with ArtifactRemovalTransformerConfig (hf_config.py:8-44)."""

    in_channels: int = 32
    out_channels: int = 32
    embedding_size: int = 128
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    feedforward_size: int = 2048
    dropout: float = 0.1
    max_len: int = 2048
    pos_mode: str = "sinusoidal"
    recon_log_softmax: bool = False
    recon_zscore: Optional[str] = None  # None | 'batch' | 'time'
    loss_zscore: bool = False
    # None = attention-weight dropout follows `dropout` (the reference's
    # behavior, art.py:207-208 — dropout ON the softmax weights). Setting 0.0
    # makes the T=1024 attention flash-eligible DURING TRAINING too
    # (transformer.py::_flash_eligible): the (B, 8, 1024, 1024) score
    # tensors never reach HBM. A documented training-recipe deviation, NOT
    # the parity default (docs/PARITY.md "Attention kernel choice").
    attn_dropout: Optional[float] = None


class ExpandConv1x1(nn.Module):
    """Channel expansion with a 1x1 conv: (B, C, T) -> (B, T, E) (art.py:42-53)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jnp.swapaxes(x, 1, 2).astype(self.dtype)  # (B, T, C)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="conv")(h)


class Reconstructor(nn.Module):
    """Linear head + optional log-softmax + optional z-score (art.py:483-564)."""

    out_channels: int
    log_softmax: bool = False
    zscore: Optional[str] = None
    eps: float = 1e-10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(x)
        if self.log_softmax:
            y = nn.log_softmax(y, axis=-1)
        if self.zscore is None:
            return y
        if self.zscore == "batch":
            axis = 0
        elif self.zscore == "time":
            axis = 1
        else:
            raise ValueError(f"Unsupported zscore mode: {self.zscore}")
        mean = jnp.mean(y, axis=axis, keepdims=True)
        n = y.shape[axis]
        var = jnp.sum((y - mean) ** 2, axis=axis, keepdims=True) / max(n - 1, 1)
        return (y - mean) / (jnp.sqrt(var) + self.eps)


class ArtifactRemovalTransformer(nn.Module):
    """Encoder-decoder EEG denoiser (art.py:566-601).

    forward(src (B,C,T), tgt (B,C,T) or None) -> reconstruction (B, C_out, T).
    Teacher forcing: the trainer passes tgt=labels (clean EEG).
    """

    config: ArtConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        tgt: Optional[jnp.ndarray] = None,
        src_mask: Optional[jnp.ndarray] = None,
        tgt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        src_x = ExpandConv1x1(cfg.embedding_size, dtype=self.dtype, name="src_embed")(src)
        src_x = PositionalEmbedding(cfg.max_len, cfg.embedding_size, cfg.pos_mode,
                                    dtype=self.dtype, name="src_pos")(src_x)
        src_x = nn.Dropout(cfg.dropout)(src_x, deterministic=deterministic)

        enc_attn_mask = None
        if src_mask is not None:
            # src_mask True = masked-out (art.py:585-588); 0 entries get -1e9.
            enc_attn_mask = (~src_mask.astype(bool))[:, None, None, :]

        ad = cfg.dropout if cfg.attn_dropout is None else cfg.attn_dropout
        memory = TransformerEncoder(
            cfg.embedding_size, cfg.num_encoder_layers, cfg.num_heads,
            cfg.feedforward_size, cfg.dropout, ad, dtype=self.dtype,
            name="encoder",
        )(src_x, attn_mask=enc_attn_mask, deterministic=deterministic)

        if tgt is None:
            tgt = src
        tgt_x = ExpandConv1x1(cfg.embedding_size, dtype=self.dtype, name="tgt_embed")(tgt)
        tgt_x = PositionalEmbedding(cfg.max_len, cfg.embedding_size, cfg.pos_mode,
                                    dtype=self.dtype, name="tgt_pos")(tgt_x)
        tgt_x = nn.Dropout(cfg.dropout)(tgt_x, deterministic=deterministic)

        dec_self_mask = None
        if tgt_mask is not None:
            dec_self_mask = (~tgt_mask.astype(bool))[:, None, :, :] if tgt_mask.ndim == 3 \
                else (~tgt_mask.astype(bool))[:, None, None, :]

        out = TransformerDecoder(
            cfg.embedding_size, cfg.num_decoder_layers, cfg.num_heads,
            cfg.feedforward_size, cfg.dropout, ad, dtype=self.dtype,
            name="decoder",
        )(tgt_x, memory, dec_self_mask, enc_attn_mask, deterministic=deterministic)

        recon = Reconstructor(
            cfg.out_channels, cfg.recon_log_softmax, cfg.recon_zscore,
            dtype=self.dtype, name="reconstructor",
        )(out)  # (B, T, C_out)
        return jnp.swapaxes(recon, 1, 2).astype(jnp.float32)  # (B, C_out, T)


def art_loss(logits: jnp.ndarray, labels: jnp.ndarray, loss_zscore: bool = False,
             eps: float = 1e-10) -> jnp.ndarray:
    """MSE or per-channel time-z-scored MSE (art.py:625-635, 650-657).

    logits/labels: (B, C, T).
    """
    if not loss_zscore:
        return jnp.mean((logits - labels) ** 2)
    # z-score along time with unbiased std (torch .std parity).
    def z(x):
        xt = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        mean = jnp.mean(xt, axis=1, keepdims=True)
        var = jnp.sum((xt - mean) ** 2, axis=1, keepdims=True) / (xt.shape[1] - 1)
        return (xt - mean) / (jnp.sqrt(var) + eps)

    return jnp.mean((z(logits) - z(labels)) ** 2)
