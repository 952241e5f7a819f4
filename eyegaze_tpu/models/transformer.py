"""Shared Flax transformer stack (post-LN, ReLU FFN).

TPU-native rebuild of the from-scratch torch blocks in
``3_Models/backbones/art.py``: MultiHeadAttention (:128-213), FeedForward
(:215-272), encoder/decoder blocks with post-LayerNorm residuals (:274-481),
and sinusoidal/learned positional embeddings (:55-126).

Design notes (TPU-first, not a translation):
- short sequences (139 tokens EEG, 197 ViT) use a plain einsum + f32 softmax —
  the (B, H, T, T) scores fit comfortably on chip and XLA fuses them;
- long sequences (ART at T=1024, where 18 attention calls would stream
  ~67 MB/sample/layer of f32 scores through HBM) dispatch to the Pallas
  flash-attention kernel when no mask/weight-return/attention-dropout is
  active, so the score matrix never reaches HBM (see ``_flash_eligible``);
- computation dtype is configurable (bf16 by default under training) with f32
  params and f32 softmax/LayerNorm accumulation, matching TPU best practice.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


def _flash_eligible(tq: int, tk: int, d_k: int, has_mask: bool,
                    dropout_active: bool, return_weights: bool,
                    dtype=jnp.bfloat16) -> bool:
    """True when the Pallas TPU flash-attention kernel can replace the einsum
    path with identical semantics.

    Semantic gates (always enforced, no override): no additive/boolean mask
    (ART's hot path passes none), no attention-weight dropout (training
    parity: the reference applies dropout ON the softmax weights,
    art.py:207-208, which a fused kernel cannot reproduce — those calls keep
    the einsum path), and no requested weight capture (analysis capture needs
    the materialized map).

    Tileability gates (always enforced, no override): sequence lengths must
    tile the kernel's 128-step grid (the short 139/197-token models fall out
    here by design — their scores are cheap), head dims above 128 must be a
    multiple of 128, and the backend must be TPU (same affirmative test as
    ``ops.pallas_kernels.pallas_enabled``).

    Performance/parity gates (auto mode only; ``EYEGAZE_FLASH_ATTN=1``
    bypasses exactly these two, used by ``scripts/bench_flash_attn.py`` to
    re-measure):
    - ``d_k`` must be a multiple of 128: the kernel lays the head dim across
      the 128-wide lane axis, so d_k=16 pads 8× — measured on 1× v5e at ART's
      exact shape (B=16, H=8, T=1024, d_k=16,
      ``measurements/flash_attn_r3.json``): flash LOSES 2.0× on inference
      (77.3 vs 37.9 ms) and 2.2× on the dropout-0 train step (261 vs 117 ms).
    - compute ``dtype`` must be bfloat16: the kernel ingests its MXU operands
      at bf16 precision, so against an f32 einsum path its output drifts
      ~0.9% rel (same measurement) — a dtype property, not a d_k artifact.
      Auto-dispatch therefore only replaces attention whose einsum path would
      run in bf16 anyway (docs/PARITY.md "long-sequence attention").

    The einsum path is the production default for every current model;
    ``EYEGAZE_FLASH_ATTN=0`` forces it everywhere; any other value is auto.
    """
    env = os.environ.get("EYEGAZE_FLASH_ATTN", "auto")
    if env == "0":
        return False
    # Semantic gates — never overridable (parity contract, docs/PARITY.md).
    if has_mask or dropout_active or return_weights:
        return False
    # Tileability gates — never overridable, including under env='1'.
    if tq % 128 or tk % 128:
        return False
    if d_k > 128 and d_k % 128:
        return False
    if jax.default_backend() != "tpu":
        return False
    if env == "1":  # re-measurement hook: bypasses only the gates below
        return True
    # Performance gate: d_k must fill the 128-wide lane axis.
    if d_k % 128:
        return False
    # Parity gate: bf16 compute only (kernel MXU ingestion is bf16).
    return dtype == jnp.bfloat16


def _headpack_eligible(tq: int, tk: int, d_k: int, has_mask: bool,
                       dropout_active: bool, return_weights: bool) -> bool:
    """True when the head-packed VMEM-resident Pallas kernel
    (``ops/attn_kernels.py``) replaces the einsum path.

    Semantic gates (always enforced, same reasoning as ``_flash_eligible``):
    no mask, no attention-weight dropout, no weight capture.

    Tileability gates: tq a multiple of the kernel's 128-row query tile, and
    the full-key score tile plus K/V panels must fit VMEM — tk <= 2048 keeps
    the f32 (128, Tk) tile <= 1 MB.

    Perf gate (auto mode): the small-head-dim long-sequence regime the
    kernel exists for — d_k <= 32 (the einsum path's HBM-bound score traffic
    dominates there; at d_k >= 128 the stock flash kernel owns the shape)
    and tq == tk >= 1024 (short sequences' scores are cheap, measured in
    round 3).  ``EYEGAZE_HEADPACK_ATTN=1`` forces (bench hook), ``0``
    disables, auto applies the gates above.

    AUTO IS PERMANENTLY OFF — the on-device shootout LOST
    (``scripts/bench_headpack.py`` → ``measurements/headpack_attn_r5.json``,
    1× v5e, ART shape B=16/H=8/T=1024/d_k=16): kernel-only the head-packed
    kernel ties the standalone einsum (0.97-1.07× across two sessions and
    both dtypes), and full-model ART inference lands at 426 windows/s —
    1.24× over the UNCHUNKED einsum (342) but 0.68× of the q-chunked
    production path (630).  The q-chunk scan already keeps the live score
    slab on-chip while letting XLA fuse surrounding ops, which the
    opaque-kernel boundary prevents; d_k=16's 8× MXU contraction padding is
    intrinsic either way.  The kernel is retained as a tested correctness
    artifact and re-measurement hook (same precedent as the stock-flash and
    widened-PLV negative results, BASELINE.md).  Parity is pinned by
    ``tests/test_flash_attn.py::test_headpacked_attention_parity``.
    """
    env = os.environ.get("EYEGAZE_HEADPACK_ATTN", "auto")
    if env == "0":
        return False
    if has_mask or dropout_active or return_weights:
        return False
    if tq % 128 or jax.default_backend() != "tpu":
        return False
    if tk > 2048:
        return False
    if env == "1":
        return True
    # Auto: off — the shootout measured the q-chunked einsum 1.48× FASTER
    # than this kernel at the only shape in scope (docstring above).
    return False


def _attn_qchunk(b: int, num_heads: int, tq: int, tk: int, has_mask: bool,
                 dropout_active: bool, return_weights: bool) -> int:
    """Query-chunk size for the chunked einsum attention path, or 0 (off).

    Chunking splits the query axis so each ``lax.scan`` step materializes
    only a (B, H, Qc, Tk) score slab instead of the full (B, H, Tq, Tk) — at
    ART's hot shape (B=16, H=8, T=1024) the live f32 slab shrinks from
    512 MB to 512/(Tq/Qc) MB while the einsum/softmax SEMANTICS are
    unchanged (softmax rows are complete: chunking is over queries, never
    keys).  This targets HBM traffic, the measured bottleneck of the d_k=16
    regime where the Pallas flash kernel loses 2× to lane padding
    (docs/PARITY.md "long-sequence attention").

    Semantic gates (always enforced): calls with a mask, active
    attention-weight dropout, or a weight-capture request keep the unchunked
    path (same reasoning as ``_flash_eligible`` — dropout RNG semantics and
    the materialized map).

    Auto mode (``EYEGAZE_ATTN_QCHUNK`` unset or ``auto``) applies the
    on-device shootout's measured boundary
    (``scripts/bench_art_batch.py`` → ``measurements/art_batch_sweep_r4.json``,
    1× v5e): chunk=128 wins 1.75× on ART inference (635 vs 363 windows/s)
    and 2.4× on the dropout-0 train recipe (291 vs 122) at B·H = 16·8 = 128,
    but LOSES at B·H = 32·8 = 256 where the bigger batch already fills the
    pipeline.  Auto therefore chunks only TPU self-attention with
    tq == tk >= 1024, tq % 128 == 0, and b·num_heads <= 128.
    ``EYEGAZE_ATTN_QCHUNK=<int>`` forces that chunk (gated on divisibility),
    ``0`` forces off.

    Gate provenance: the B·H <= 128 boundary interpolates between two
    measured points (128 wins, 256 loses); the low-B·H interior (serving
    shapes like B=1-8) was initially an extrapolation (ADVICE r4) and was
    MEASURED in round 5 (``scripts/bench_art_batch.py --low-batch`` →
    ``measurements/art_low_batch_r5.json``, 1× v5e): chunking wins 1.49×
    at B=4 (383 vs 257 windows/s) and is within noise at B=1 (152 vs 149),
    so the whole auto region is now measured-or-neutral.  Semantics are
    pinned by ``tests/test_flash_attn.py`` parity either way.
    """
    if has_mask or dropout_active or return_weights:
        return 0
    env = os.environ.get("EYEGAZE_ATTN_QCHUNK", "auto")
    if env not in ("", "auto"):
        try:
            qc = int(env)
        except ValueError:
            return 0
        if qc <= 0 or qc >= tq or tq % qc:
            return 0
        return qc
    # Auto: the measured win region only (TPU; CPU/GPU keep the unchunked
    # einsum — no measurement supports chunking there).
    if jax.default_backend() != "tpu":
        return 0
    if tq != tk or tq < 1024 or tq % 128 or b * num_heads > 128:
        return 0
    return 128


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

        dropout_active = self.dropout > 0.0 and not deterministic
        if _flash_eligible(tq, tk, d_k, attn_mask is not None,
                           dropout_active, return_weights, self.dtype):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            # Kernel layout is (B, H, T, d); it accumulates the softmax and
            # context in f32 internally, matching the einsum path's
            # preferred_element_type=f32 contract.
            ctx = flash_attention(
                jnp.swapaxes(qh, 1, 2), jnp.swapaxes(kh, 1, 2),
                jnp.swapaxes(vh, 1, 2), sm_scale=1.0 / math.sqrt(d_k),
            )
            context = jnp.swapaxes(ctx, 1, 2).reshape(b, tq, self.d_model)
            return dense("out_proj")(context.astype(self.dtype))

        if _headpack_eligible(tq, tk, d_k, attn_mask is not None,
                              dropout_active, return_weights):
            from eyegaze_tpu.ops.attn_kernels import headpacked_attention

            ctx = headpacked_attention(qh, kh, vh, 1.0 / math.sqrt(d_k))
            return dense("out_proj")(
                ctx.reshape(b, tq, self.d_model).astype(self.dtype))

        qchunk = _attn_qchunk(b, self.num_heads, tq, tk,
                              attn_mask is not None, dropout_active,
                              return_weights)
        if qchunk:
            # Chunked einsum: scan over query chunks so only one
            # (B, H, Qc, Tk) f32 slab is live at a time; ``jax.checkpoint``
            # on the body keeps the backward pass at the same cap (chunk
            # softmax weights are recomputed, not saved).  Row softmaxes see
            # the full key axis — numerically identical to the unchunked
            # einsum below.
            scale = 1.0 / math.sqrt(d_k)

            @jax.checkpoint
            def chunk_ctx(qc):
                s = jnp.einsum("bqhd,bkhd->bhqk", qc, kh,
                               preferred_element_type=jnp.float32) * scale
                a = jax.nn.softmax(s, axis=-1)
                return jnp.einsum(
                    "bhqk,bkhd->bqhd", a.astype(self.dtype), vh,
                    preferred_element_type=jnp.float32).astype(self.dtype)

            qs = qh.reshape(b, tq // qchunk, qchunk, self.num_heads, d_k)
            qs = jnp.moveaxis(qs, 1, 0)  # (nc, B, Qc, H, d)
            _, ctx = jax.lax.scan(lambda c, qc: (c, chunk_ctx(qc)), None, qs)
            context = jnp.moveaxis(ctx, 0, 1).reshape(b, tq, self.d_model)
            return dense("out_proj")(context)

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
