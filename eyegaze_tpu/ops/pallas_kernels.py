"""Pallas TPU kernels for the connectivity hot path.

``pairwise_phase_metrics_pallas`` computes the three broadcast-reduce IBS
metrics (PLI, wPLI numerator, Phase_Diff) for a whole batch of channel pairs
in one kernel: phases/powers stay resident in VMEM and the (C, C, T)
pairwise tensor is never materialized — each grid program loops over player-1
channels, forming one (C, T) difference row block at a time in registers/VMEM
and reducing immediately.  This is the Pallas form of the chunked
``lax.map`` fallback in ops/connectivity.py; enable with EYEGAZE_PALLAS=1
(or pass use_pallas=True), equivalence-tested in interpret mode on CPU.

VMEM budget per program (C=32, T=1024, f32): 4 inputs x 128 KB + 3 outputs
x 4 KB + one (C, T) temp — well under the ~16 MB/core budget.

MEASURED (v5e, B=64, C=32, T=1024): this kernel is bit-exact vs the fallback
but 23x SLOWER (0.84 ms vs 0.036 ms) — XLA's fusion of the chunked
broadcast-reduce already achieves ~22 Tops/s on the VPU, while the kernel's
per-row fori_loop serializes the work.  It therefore stays OPT-IN
(EYEGAZE_PALLAS=1) as a reference implementation; the XLA path is the
production default.  Kept because it documents the VMEM-resident formulation
and provides an independent correctness check.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_enabled() -> bool:
    return os.environ.get("EYEGAZE_PALLAS", "0") == "1"


def _kernel(ph1_ref, ph2_ref, pw1_ref, pw2_ref, pli_ref, wnum_ref, pdiff_ref):
    c = ph1_ref.shape[1]
    t = ph1_ref.shape[2]
    ph2 = ph2_ref[0]
    pw2 = pw2_ref[0]

    def body(i, _):
        ph1_row = ph1_ref[0, pl.ds(i, 1), :]  # (1, T)
        pw1_row = pw1_ref[0, pl.ds(i, 1), :]
        dphi = ph1_row - ph2  # (C, T) broadcast over rows
        sgn = jnp.sign(dphi)
        pli_ref[0, pl.ds(i, 1), :] = jnp.mean(sgn, axis=1)[None, :]
        pdiff_ref[0, pl.ds(i, 1), :] = jnp.mean(jnp.abs(dphi), axis=1)[None, :]
        w = (pw1_row + pw2) * 0.5
        wnum_ref[0, pl.ds(i, 1), :] = jnp.sum(sgn * w, axis=1)[None, :]
        return 0

    jax.lax.fori_loop(0, c, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_phase_metrics_pallas(
    phase1: jnp.ndarray,
    phase2: jnp.ndarray,
    power1: jnp.ndarray,
    power2: jnp.ndarray,
    interpret: bool = False,
):
    """(N, C, T) x4 -> (pli, wpli, pdiff) each (N, C, C).

    pli here is SIGNED-mean (abs applied by the caller for parity with the
    fallback's |mean sign|); wpli = |wnum| / (separable denominator + eps)
    is assembled by the caller.
    Returns (mean_sign (N,C,C), weighted_sign_sum (N,C,C), pdiff (N,C,C)).
    """
    n, c, t = phase1.shape
    block_in = pl.BlockSpec((1, c, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    block_out = pl.BlockSpec((1, c, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n, c, c), jnp.float32)] * 3
    mean_sgn, wnum, pdiff = pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[block_in] * 4,
        out_specs=[block_out] * 3,
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
):
    """Full (pli, wpli, pdiff) assembly from the Pallas kernel, (B, C, T) in."""
    mean_sgn, wnum, pdiff = pairwise_phase_metrics_pallas(
        phase1, phase2, power1, power2, interpret=interpret)
    pli = jnp.abs(mean_sgn)
    den = (jnp.sum(power1, axis=-1)[:, :, None]
           + jnp.sum(power2, axis=-1)[:, None, :]) * 0.5
    wpli = jnp.abs(wnum / (den + eps))
    return pli, wpli, pdiff
