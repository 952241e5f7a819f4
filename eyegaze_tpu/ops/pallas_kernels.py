"""Pallas TPU kernels for the connectivity hot path.

``pairwise_phase_metrics_pallas`` computes the three VPU-bound IBS metrics
(PLI, wPLI numerator, Phase_Diff) — the only parts of the connectivity block
(dual_eeg_transformer.py:593-758) that cannot be cast onto the MXU, because
sign/abs of the pairwise phase difference are not bilinear — in one fused
kernel per (batch, row-tile): the player-2 phase/power blocks (C, T) stay
resident in VMEM across the row tiles of a batch element, one (R, C, T)
difference tile is formed in VMEM and all three reductions consume it in a
single pass.

Layout rationale (round-2 rewrite): round 1's kernel iterated player-1
channels with a ``fori_loop`` over (1, T) rows — one sublane of the 8x128
VPU, measured 23x slower than XLA's fused broadcast-reduce.  This version
tiles R=8 player-1 rows per program so every elementwise op runs on
(8*C, 128)-aligned registers, and shares one sgn/|dphi| computation across
the three metrics.

VMEM per program (R=16, C=32, T=1024, f32): 2x(C,T) resident + 2x(R,T) +
~3x(R,C,T) temporaries ~= 7 MB — inside the ~16 MB/core budget.

MEASURED (1x TPU v5e, B=64, C=32, T=1024, scripts/bench_pallas.py,
host-fetch-fenced timing — an earlier table in this docstring was measured
with jax.block_until_ready, which returns after dispatch on the relay
backend and reported meaningless ~0.02 ms figures):
XLA 1.554 ms vs Pallas 1.413/1.504/1.904 ms (R=32/8/16), bit-exact
(max_abs_diff = 0.0).  The fused kernel WINS at R=32 (1.10x): one pass
shares the sgn/|dphi| tile across all three reductions where XLA
re-materializes it.  It is therefore the PRODUCTION DEFAULT on TPU
backends; EYEGAZE_PALLAS=0 forces the XLA path (still the default on
CPU/GPU, and the correctness cross-check everywhere).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 32  # measured winner at C=32, T=1024 (see module docstring)


def pallas_enabled() -> bool:
    """Auto: on for TPU backends (measured 1.10x over the XLA path, bit-
    exact), off elsewhere (Pallas TPU kernels only interpret on CPU).
    Tested affirmatively — an unrecognized backend (e.g. METAL) must NOT
    default to TPU kernels.  EYEGAZE_PALLAS=1/0 forces on/off."""
    env = os.environ.get("EYEGAZE_PALLAS", "auto")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def _kernel(ph1_ref, ph2_ref, pw1_ref, pw2_ref, pli_ref, wnum_ref, pdiff_ref):
    ph1 = ph1_ref[0]  # (R, T) row tile of player-1 phases
    ph2 = ph2_ref[0]  # (C, T) all player-2 phases (resident across row tiles)
    pw1 = pw1_ref[0]
    pw2 = pw2_ref[0]
    dphi = ph1[:, None, :] - ph2[None, :, :]  # (R, C, T)
    sgn = jnp.sign(dphi)
    pli_ref[0] = jnp.mean(sgn, axis=-1)
    pdiff_ref[0] = jnp.mean(jnp.abs(dphi), axis=-1)
    # wPLI numerator: weights w_ij(t) = (p1_i(t) + p2_j(t)) / 2.
    w = (pw1[:, None, :] + pw2[None, :, :]) * 0.5
    wnum_ref[0] = jnp.sum(sgn * w, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret", "row_tile"))
def pairwise_phase_metrics_pallas(
    phase1: jnp.ndarray,
    phase2: jnp.ndarray,
    power1: jnp.ndarray,
    power2: jnp.ndarray,
    interpret: bool = False,
    row_tile: int = ROW_TILE,
):
    """(N, C, T) x4 -> (mean_sign, weighted_sign_sum, pdiff), each (N, C, C).

    pli here is SIGNED-mean (abs applied by the caller for parity with the
    fallback's |mean sign|); wpli = |wnum| / (separable denominator + eps)
    is assembled by the caller.
    """
    n, c, t = phase1.shape
    r = row_tile if c % row_tile == 0 else c
    row_block = pl.BlockSpec((1, r, t), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    full_block = pl.BlockSpec((1, c, t), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, r, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n, c, c), jnp.float32)] * 3
    mean_sgn, wnum, pdiff = pl.pallas_call(
        _kernel,
        grid=(n, c // r),
        in_specs=[row_block, full_block, row_block, full_block],
        out_specs=[out_block] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(phase1.astype(jnp.float32), phase2.astype(jnp.float32),
      power1.astype(jnp.float32), power2.astype(jnp.float32))
    return mean_sgn, wnum, pdiff


def pairwise_phase_metrics(
    phase1: jnp.ndarray,
    phase2: jnp.ndarray,
    power1: jnp.ndarray,
    power2: jnp.ndarray,
    eps: float = 1e-8,
    interpret: bool = False,
    row_tile: int = ROW_TILE,
):
    """Full (pli, wpli, pdiff) assembly from the Pallas kernel, (B, C, T) in."""
    mean_sgn, wnum, pdiff = pairwise_phase_metrics_pallas(
        phase1, phase2, power1, power2, interpret=interpret, row_tile=row_tile)
    pli = jnp.abs(mean_sgn)
    den = (jnp.sum(power1, axis=-1)[:, :, None]
           + jnp.sum(power2, axis=-1)[:, None, :]) * 0.5
    wpli = jnp.abs(wnum / (den + eps))
    return pli, wpli, pdiff


def _kernel5(ph1_ref, ph2_ref, pw1_ref, pw2_ref,
             pli_ref, wnum_ref, pdiff_ref, pre_ref, pim_ref):
    """Widened variant: the dphi tile additionally feeds PLV partials
    (mean cos dphi, mean sin dphi) — cos(phi1-phi2) is mathematically equal
    to the production path's c1c2+s1s2 matmul formulation, but computed here
    as VPU transcendentals over the (R, C, T) tile instead of 4 MXU matmuls.
    Kept as the measured answer to "widen the fused region?" (VERDICT r2 #6):
    see scripts/bench_pallas.py --plv5 for the shootout."""
    ph1 = ph1_ref[0]
    ph2 = ph2_ref[0]
    pw1 = pw1_ref[0]
    pw2 = pw2_ref[0]
    dphi = ph1[:, None, :] - ph2[None, :, :]  # (R, C, T)
    sgn = jnp.sign(dphi)
    pli_ref[0] = jnp.mean(sgn, axis=-1)
    pdiff_ref[0] = jnp.mean(jnp.abs(dphi), axis=-1)
    w = (pw1[:, None, :] + pw2[None, :, :]) * 0.5
    wnum_ref[0] = jnp.sum(sgn * w, axis=-1)
    pre_ref[0] = jnp.mean(jnp.cos(dphi), axis=-1)
    pim_ref[0] = jnp.mean(jnp.sin(dphi), axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret", "row_tile"))
def pairwise_phase_plv_metrics_pallas(
    phase1: jnp.ndarray,
    phase2: jnp.ndarray,
    power1: jnp.ndarray,
    power2: jnp.ndarray,
    interpret: bool = False,
    row_tile: int = ROW_TILE,
):
    """(N, C, T) x4 -> (mean_sign, weighted_sign_sum, pdiff, plv_re, plv_im),
    each (N, C, C): the widened kernel that also emits PLV partial means."""
    n, c, t = phase1.shape
    r = row_tile if c % row_tile == 0 else c
    row_block = pl.BlockSpec((1, r, t), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    full_block = pl.BlockSpec((1, c, t), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, r, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n, c, c), jnp.float32)] * 5
    return pl.pallas_call(
        _kernel5,
        grid=(n, c // r),
        in_specs=[row_block, full_block, row_block, full_block],
        out_specs=[out_block] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(phase1.astype(jnp.float32), phase2.astype(jnp.float32),
      power1.astype(jnp.float32), power2.astype(jnp.float32))


def pairwise_phase_plv_metrics(
    phase1: jnp.ndarray,
    phase2: jnp.ndarray,
    power1: jnp.ndarray,
    power2: jnp.ndarray,
    eps: float = 1e-8,
    interpret: bool = False,
    row_tile: int = ROW_TILE,
):
    """(plv, pli, wpli, pdiff) entirely from the widened kernel."""
    mean_sgn, wnum, pdiff, pre, pim = pairwise_phase_plv_metrics_pallas(
        phase1, phase2, power1, power2, interpret=interpret, row_tile=row_tile)
    pli = jnp.abs(mean_sgn)
    den = (jnp.sum(power1, axis=-1)[:, :, None]
           + jnp.sum(power2, axis=-1)[:, None, :]) * 0.5
    wpli = jnp.abs(wnum / (den + eps))
    plv = jnp.sqrt(pre**2 + pim**2)
    return plv, pli, wpli, pdiff
