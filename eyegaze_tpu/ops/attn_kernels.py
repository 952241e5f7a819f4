"""Head-packed Pallas attention for the small-head-dim (ART) regime.

Why the stock flash kernel loses here (measured, BASELINE.md "long-sequence
attention"): ``jax.experimental.pallas.ops.tpu.flash_attention`` lays the
head dim across the 128-wide lane axis, so ART's d_k = 16
(/root/reference/3_Models/backbones/art.py:128-213 geometry: d_model 128,
8 heads) pads 8x in both MXU work and VMEM traffic — 2x SLOWER than the
einsum path end to end (measurements/flash_attn_r3.json).

Why the einsum path is still slow: it materializes the (B, H, Tq, Tk) f32
score tensor through HBM (512 MB at ART's B=16, T=1024 — write + softmax
read + PV read ~ 1.5 GB of traffic per attention call on an 819 GB/s part),
so each of ART's 18 attention calls is HBM-bound at ~2 ms.

This kernel removes BOTH costs for the small-d regime:

- the whole per-(batch, q-tile) computation lives in VMEM: scores for one
  128-row query tile against the FULL key axis are formed, softmaxed, and
  contracted with V without ever touching HBM (at T = 1024 the f32 tile is
  128 x 1024 = 512 KB; K/V per (batch, head) are (1024, 16) = 32 KB bf16 —
  far inside the ~16 MB VMEM budget, so no online softmax is needed);
- HBM traffic collapses to reading Q/K/V once and writing the context
  (~32 MB/call vs ~1.5 GB).

The per-head matmuls still pad their 16-wide contraction on the MXU (that
is intrinsic to d_k = 16), but padded-MXU arithmetic at VMEM bandwidth is
~6x cheaper than HBM-bound einsum traffic at this shape.

Numerics contract (same as the production einsum path,
models/transformer.py): scores accumulate in f32 (``preferred_element_type``)
from input-dtype operands, softmax in f32, probabilities cast back to the
input dtype for the PV matmul with f32 accumulation.  Gradients: pallas_call
has no autodiff rule, so ``headpacked_attention`` carries a ``custom_vjp``
whose backward recomputes the standard attention gradient in einsum form —
forward speed is the target (ART inference); training parity is preserved.

Dispatch: ``models/transformer.py::_headpack_eligible`` (semantic gates
mirror the flash/q-chunk gates; perf gate requires the measured win region,
``EYEGAZE_HEADPACK_ATTN`` forces).  Shootout: ``scripts/bench_headpack.py``
-> ``measurements/headpack_attn_r5.json``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_TILE = 128  # rows of queries per program (sublane-aligned MXU tile)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # One (batch, head, q-tile) per program: q_ref (1, 1, QT, d),
    # k_ref/v_ref (1, 1, Tk, d), o_ref like q_ref.  Per-program VMEM is
    # ~0.6 MB (one (QT, Tk) f32 score tile + the K/V panels), so Mosaic can
    # double-buffer across the grid — the first cut unrolled all H heads in
    # one program and kept H score tiles live, which blew the 16 MB scoped
    # VMEM limit at f32 (18 MB requested; battery_r5.log, 01:29).
    q = q_ref[0, 0]  # (QT, d)
    k = k_ref[0, 0]  # (Tk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (QT, Tk) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (QT, d) f32 accum
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _headpacked_fwd_impl(qh, kh, vh, scale: float, interpret: bool = False):
    """(B, Tq, H, d) x3 -> (B, Tq, H, d) context, einsum-path numerics."""
    b, tq, h, d = qh.shape
    tk = kh.shape[1]
    assert tq % Q_TILE == 0, (tq, Q_TILE)
    # (B, H, T, d) layout: batch and head become cheap block indices, the
    # (T, d) panels the MXU consumes are contiguous.
    qt = jnp.swapaxes(qh, 1, 2)
    kt = jnp.swapaxes(kh, 1, 2)
    vt = jnp.swapaxes(vh, 1, 2)
    q_block = pl.BlockSpec((1, 1, Q_TILE, d), lambda i, j, k: (i, j, k, 0),
                           memory_space=pltpu.VMEM)
    kv_block = pl.BlockSpec((1, 1, tk, d), lambda i, j, k: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        grid=(b, h, tq // Q_TILE),
        in_specs=[q_block, kv_block, kv_block],
        out_specs=q_block,
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), qh.dtype),
        interpret=interpret,
    )(qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def headpacked_attention(qh, kh, vh, scale: float, interpret: bool = False):
    """Softmax attention with VMEM-resident scores (see module docstring).

    Shapes: qh (B, Tq, H, d), kh/vh (B, Tk, H, d) -> (B, Tq, H, d), the
    layout ``MultiHeadAttention`` already holds.  Unmasked, no attention
    dropout, no weight capture — callers gate on those semantics.
    """
    return _headpacked_fwd_impl(qh, kh, vh, scale, interpret)


def _headpacked_vjp_fwd(qh, kh, vh, scale, interpret):
    return _headpacked_fwd_impl(qh, kh, vh, scale, interpret), (qh, kh, vh)


def _headpacked_vjp_bwd(scale, interpret, res, g):
    """Standard attention backward, recomputed in einsum form (the kernel is
    a forward-only speedup; training parity over raw speed here)."""
    qh, kh, vh = res
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)  # (B, H, Tq, Tk) f32
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32).astype(vh.dtype)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, vh.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp
    ds = ds * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kh.astype(jnp.float32)).astype(qh.dtype)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qh.astype(jnp.float32)).astype(kh.dtype)
    return dq, dk, dv


headpacked_attention.defvjp(_headpacked_vjp_fwd, _headpacked_vjp_bwd)
