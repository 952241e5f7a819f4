"""On-device EEG preprocessing: bandpass -> CAR -> z-score -> windowing.

TPU-native replacement for ``2_Preprocessing/scripts/preprocess_eeg_windows.py``
(:96-206).  The whole pipeline is one jit-compiled, vmap-batched function over
trials, instead of per-trial scipy calls.

Butterworth ``filtfilt`` parity: IIR filtering is sequential along time, but
on TPU we run it as a ``lax.scan`` whose per-step work is a huge elementwise
vector over (trials x channels) lanes, so the scan is bandwidth-bound, not
latency-bound.  ``bandpass_filtfilt`` reproduces ``scipy.signal.filtfilt``'s
default behavior (odd padding, padlen = 3 * max(len(a), len(b)), lfilter_zi
initial conditions) to float32 tolerance — parity-tested against scipy in
tests/test_preprocess.py.  An FFT-mask filter (``ops.spectral.bandpass_fft``)
is the cheaper alternative used inside the models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _butter_sos(order: int, low: float, high: float, fs: float):
    """Butterworth bandpass as second-order sections + sosfilt_zi (host).

    SOS cascade is required for float32 stability: the direct-form (b, a)
    representation of an order-4 bandpass with normalized low cutoff ~0.004
    is catastrophically ill-conditioned in f32.
    """
    from scipy import signal as sps

    nyq = fs / 2.0
    lo = low / nyq
    hi = min(high / nyq, 0.99)
    sos = sps.butter(order, [lo, hi], btype="band", output="sos")
    zi = sps.sosfilt_zi(sos)  # (n_sections, 2)
    return np.asarray(sos, np.float64), np.asarray(zi, np.float64)


def fir_bandpass_coeffs(order: int, low: float, high: float, fs: float):
    """Expose (sos, zi) for a Butterworth band."""
    return _butter_sos(order, low, high, fs)


def _make_sosfilt(sos: np.ndarray, zi: np.ndarray):
    """Jittable SOS cascade along the last axis with given static coeffs.

    Matches scipy.signal.sosfilt with zi scaled by the first input sample
    (scipy filtfilt/sosfiltfilt method='pad' initial-condition convention).
    """
    sos = jnp.asarray(sos, jnp.float32)  # (ns, 6)
    zi = jnp.asarray(zi, jnp.float32)  # (ns, 2)
    n_sections = sos.shape[0]

    def run(x: jnp.ndarray) -> jnp.ndarray:
        x0 = x[..., :1]
        xs = jnp.moveaxis(x, -1, 0)  # (T, ...)

        def step(carry, xt):
            # carry: (ns, ..., 2) states; xt flows through the cascade.
            states = carry
            new_states = []
            for s in range(n_sections):
                b0, b1, b2, _, a1, a2 = sos[s]
                z = states[s]
                yt = b0 * xt + z[..., 0]
                z0n = b1 * xt + z[..., 1] - a1 * yt
                z1n = b2 * xt - a2 * yt
                new_states.append(jnp.stack([z0n, z1n], axis=-1))
                xt = yt
            return jnp.stack(new_states, axis=0), xt

        init = jnp.stack(
            [zi[s] * x0 for s in range(n_sections)], axis=0
        )  # (ns, ..., 2): zi broadcast-scaled by the first sample
        _, ys = jax.lax.scan(step, init, xs)
        return jnp.moveaxis(ys, 0, -1)

    return run


def bandpass_filtfilt_fir(
    x: jnp.ndarray,
    low: float = 0.5,
    high: float = 50.0,
    sampling_rate: float = 250.0,
    order: int = 4,
) -> jnp.ndarray:
    """Zero-phase Butterworth bandpass, scipy.signal.filtfilt parity.

    Forward-backward SOS cascade with odd edge padding
    (padlen = 3 * max(len(a), len(b)) like scipy filtfilt's default) and
    sosfilt_zi initial conditions.  x: (..., T) float32.
    Matches preprocess_eeg_windows.py:96-129 defaults to ~1e-3.
    """
    sos, zi = _butter_sos(order, float(low), float(high), float(sampling_rate))
    padlen = 3 * (2 * order + 1)
    t = x.shape[-1]
    if t <= padlen:
        raise ValueError(f"signal length {t} must exceed padlen {padlen}")
    sosfilt = _make_sosfilt(sos, zi)
    # Odd extension at both ends (scipy padtype='odd').
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -padlen - 2 : -1]
    ext = jnp.concatenate([left, x, right], axis=-1)
    y = sosfilt(ext)
    y = jnp.flip(y, axis=-1)
    y = sosfilt(y)
    y = jnp.flip(y, axis=-1)
    return y[..., padlen : padlen + t]


# Back-compat alias used by ops/__init__.
bandpass_filtfilt = bandpass_filtfilt_fir


def _make_sosfilt_pscan(sos: np.ndarray, zi: np.ndarray):
    """SOS cascade along the last axis as a PARALLEL (associative) scan.

    The direct-form-II-transposed recursion per section is affine in the
    2-state: with s_t = [z0_t, z1_t],

        y_t  = b0 u_t + z0_{t-1}
        s_t  = A s_{t-1} + c u_t,   A = [[-a1, 1], [-a2, 0]],
                                    c = [b1 - a1 b0, b2 - a2 b0]

    so the whole filter is a composition of affine maps — computable with
    jax.lax.associative_scan in O(log T) depth instead of a T-step
    lax.scan.  Same recursion/zi semantics as scipy sosfilt; f32 prefix
    products of the near-unit-pole sections cost precision: measured
    max-relative error vs scipy filtfilt is ~2.4e-3 (vs 5.5e-5 for the
    sequential scan), which the downstream per-channel z-score renders
    immaterial.  Use the sequential path where exact scipy parity matters.
    """
    n_sections = sos.shape[0]
    sos_f = jnp.asarray(sos, jnp.float32)
    zi_f = jnp.asarray(zi, jnp.float32)

    def run(x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        t = shape[-1]
        u = x.reshape(-1, t)  # (L, T)
        # scipy scales EVERY section's zi by the cascade input's first
        # sample (filtfilt method='pad' convention; see _make_sosfilt).
        x0 = u[:, :1]
        for sidx in range(n_sections):
            b0, b1, b2, _, a1, a2 = [sos_f[sidx, j] for j in range(6)]
            a_mat = jnp.asarray([[-a1, 1.0], [-a2, 0.0]], jnp.float32)
            c_vec = jnp.stack([b1 - a1 * b0, b2 - a2 * b0])
            s0 = zi_f[sidx][None, :] * x0  # (L, 2)
            # Affine elements over the scan axis (T first for pytree scan).
            a_elems = jnp.broadcast_to(a_mat, (t, 2, 2))
            v_elems = u.T[:, :, None] * c_vec[None, None, :]  # (T, L, 2)

            # Exact-f32 prefix products: bf16 MXU products of the
            # near-unit-pole sections are unstable on TPU (same failure mode
            # as the blocked path — see _make_sosfilt_blocked's precision
            # note), so the 2x2 composition is expanded into VPU elementwise
            # multiply-adds, which are always f32.
            def combine(p, n):
                pa, pv = p
                na, nv = n
                newa = (na[:, :, 0, None] * pa[:, None, 0, :]
                        + na[:, :, 1, None] * pa[:, None, 1, :])
                newv = (na[:, None, :, 0] * pv[..., 0, None]
                        + na[:, None, :, 1] * pv[..., 1, None]) + nv
                return newa, newv

            pa, pv = jax.lax.associative_scan(combine, (a_elems, v_elems))
            # s_t = A^(t..1) s0 + v_prefix_t ; y_t = b0 u_t + s_{t-1}[0]
            s = (pa[:, None, :, 0] * s0[None, :, 0, None]
                 + pa[:, None, :, 1] * s0[None, :, 1, None]) + pv  # (T, L, 2)
            s_prev0 = jnp.concatenate([s0[None, :, 0], s[:-1, :, 0]], axis=0)
            u = (b0 * u + s_prev0.T)
        return u.reshape(shape)

    return run


def bandpass_filtfilt_pscan(
    x: jnp.ndarray,
    low: float = 0.5,
    high: float = 50.0,
    sampling_rate: float = 250.0,
    order: int = 4,
) -> jnp.ndarray:
    """scipy.signal.filtfilt parity via parallel (associative) scan.

    Same odd-padding/zi semantics as ``bandpass_filtfilt_fir`` but O(log T)
    depth on device — the TPU-fast exact path (parity-tested against scipy
    in tests/test_preprocess.py).
    """
    sos, zi = _butter_sos(order, float(low), float(high), float(sampling_rate))
    padlen = 3 * (2 * order + 1)
    t = x.shape[-1]
    if t <= padlen:
        raise ValueError(f"signal length {t} must exceed padlen {padlen}")
    sosfilt = _make_sosfilt_pscan(sos, zi)
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -padlen - 2 : -1]
    ext = jnp.concatenate([left, x, right], axis=-1)
    y = sosfilt(ext)
    y = jnp.flip(y, axis=-1)
    y = sosfilt(y)
    y = jnp.flip(y, axis=-1)
    return y[..., padlen : padlen + t]


@functools.lru_cache(maxsize=64)
def _carry_kernel(sos_key: tuple, block: int, nb: int):
    """Closed-form block-carry propagation constants (f64 host math).

    The block-boundary states obey starts[n] = AB·starts[n-1] + ends[n-1]
    with AB = A^block, i.e. starts[n] = AB^n s0 + Σ_{k<n} AB^{n-1-k} ends[k].
    Instead of a sequential lax.scan (slow to compile on the remote-compile
    relay, and numerically fragile if AB products are re-formed in bf16),
    both terms become ONE einsum each against host-precomputed f64 powers:

      Pn[n]    = AB^n                (nb, 2, 2)
      Kc[k, n] = AB^(n-1-k), k < n   (nb, nb, 2, 2), else 0

    Each power is an exact f64 product cast to f32 once — no iterated f32/
    bf16 rounding, which is what destabilized the recurrence (see the
    precision note in _make_sosfilt_blocked).  Cost is O(L·nb²) — quadratic
    in the number of blocks, which at T≈3.3k (nb≈27) is trivial; a scan
    would win only for T in the hundreds of thousands.
    """
    sos = np.asarray(sos_key, np.float64).reshape(-1, 6)
    out = []
    for _, _, _, _, a1, a2 in sos:
        a_mat = np.array([[-a1, 1.0], [-a2, 0.0]])
        ab = np.linalg.matrix_power(a_mat, block)
        p = [np.eye(2)]
        for _ in range(nb):
            p.append(ab @ p[-1])
        pn = np.stack(p[:nb]).astype(np.float32)  # (nb, 2, 2) = AB^n
        kc = np.zeros((nb, nb, 2, 2))
        for k in range(nb - 1):
            kc[k, k + 1:] = np.stack(p[: nb - 1 - k])
        out.append((pn, kc.astype(np.float32)))
    return out


@functools.lru_cache(maxsize=32)
def _blocked_consts(sos_key: tuple, block: int):
    """Host-precomputed (f64) per-section constants for the blocked scan:
    A-powers Apow[j] = A^(j+1) (block, 2, 2), the within-block causal kernel
    Ktri[k, j] = A^(j-k) c for j >= k else 0 (block, block, 2), and
    AB = A^block."""
    sos = np.asarray(sos_key, np.float64).reshape(-1, 6)
    out = []
    for b0, b1, b2, _, a1, a2 in sos:
        a_mat = np.array([[-a1, 1.0], [-a2, 0.0]])
        c_vec = np.array([b1 - a1 * b0, b2 - a2 * b0])
        powers = [np.eye(2)]
        for _ in range(block):
            powers.append(a_mat @ powers[-1])  # A^1 .. A^block
        apow = np.stack(powers[1:], axis=0)  # (block, 2, 2) = A^(j+1)
        ktri = np.zeros((block, block, 2))
        for k in range(block):
            # j >= k: A^(j-k) c
            ktri[k, k:] = np.stack([powers[j - k] @ c_vec for j in range(k, block)])
        out.append((
            float(b0),
            apow.astype(np.float32),
            ktri.astype(np.float32),
            powers[block].astype(np.float32),
        ))
    return out


def _make_sosfilt_blocked(sos: np.ndarray, zi: np.ndarray, block: int = 128):
    """SOS cascade as block-parallel recurrence: MXU matmuls inside blocks,
    one tiny scan across block summaries.

    The associative-scan formulation (``_make_sosfilt_pscan``) is HBM-bound:
    log2(T) passes over a (T, L, 2) state tensor (~measured 5.1 ms for
    (16, 32, 3250) on v5e).  Here the affine recurrence
    ``s_t = A s_{t-1} + c u_t`` is solved exactly per block of ``block``
    samples: the zero-state response is a causal within-block convolution
    ``s_local = u_blocks @ Ktri`` (one well-shaped matmul, K = block = 128),
    block boundary states come from a ``T/block``-step scan over (L, 2)
    carries, and ``s = Apow @ s_start + s_local``.  All A-power constants are
    precomputed on host in f64.  Same recursion/zi semantics as the other
    two paths; y_t = b0 u_t + s_{t-1}[0].
    """
    sos_key = tuple(np.asarray(sos, np.float64).ravel())
    consts = _blocked_consts(sos_key, block)
    zi_f = jnp.asarray(zi, jnp.float32)
    from eyegaze_tpu.ops.dft import matmul_precision

    def run(x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        t = shape[-1]
        u = x.reshape(-1, t)  # (L, T)
        x0 = u[:, :1]
        nb = -(-t // block)
        pad = nb * block - t
        carry_consts = _carry_kernel(sos_key, block, nb)
        for sidx, (b0, apow, ktri, _ab) in enumerate(consts):
            apow_j = jnp.asarray(apow)  # (B, 2, 2)
            ktri_j = jnp.asarray(ktri)  # (B, B, 2)
            up = jnp.pad(u, ((0, 0), (0, pad)))  # causal: end-pad is discarded
            ub = up.reshape(-1, nb, block)  # (L, nb, B)
            # Zero-state within-block states: (L, nb, B, 2).
            s_local = jnp.einsum("lnk,kjs->lnjs", ub, ktri_j,
                                 preferred_element_type=jnp.float32,
                                 precision=matmul_precision())
            s0 = zi_f[sidx][None, :] * x0  # (L, 2) initial state s_{-1}
            ends = s_local[:, :, block - 1, :]  # (L, nb, 2)

            # Block-boundary states in closed form (see _carry_kernel) —
            # no sequential scan, no device-side AB products.  Precision
            # note: everything touching the carries must be f32-exact on
            # TPU; bf16-rounding the near-defective AB = A^128 (entries
            # ~48, eig 0.55 for low-edge bands like 0.5-50 Hz @ 256)
            # destabilized the scan formulation to 1e26 at T=3250.  Here
            # every AB power is formed in f64 on host, and the two small
            # einsums below pin matmul_precision().
            pn, kc = carry_consts[sidx]
            starts = (
                jnp.einsum("nts,ls->lnt", jnp.asarray(pn), s0,
                           precision=matmul_precision())
                + jnp.einsum("lks,knts->lnt", ends, jnp.asarray(kc),
                             precision=matmul_precision()))  # (L, nb, 2)
            # Full state component 0 (the only one the output reads):
            # s_{nB+j}[0] = (A^(j+1) s_start)[0] + s_local[j][0].
            s0c = (apow_j[None, None, :, 0, 0] * starts[:, :, None, 0]
                   + apow_j[None, None, :, 0, 1] * starts[:, :, None, 1]
                   ) + s_local[..., 0]  # (L, nb, B)
            s_flat = s0c.reshape(u.shape[0], nb * block)[:, :t]
            s_prev0 = jnp.concatenate([s0[:, :1], s_flat[:, :-1]], axis=1)
            u = b0 * u + s_prev0
        return u.reshape(shape)

    return run


def bandpass_filtfilt_blocked(
    x: jnp.ndarray,
    low: float = 0.5,
    high: float = 50.0,
    sampling_rate: float = 250.0,
    order: int = 4,
    block: int = 128,
) -> jnp.ndarray:
    """scipy.signal.filtfilt parity via the block-parallel (MXU) recurrence.

    Same odd-padding/zi semantics as ``bandpass_filtfilt_fir``; within-block
    work rides the MXU as causal-kernel matmuls, leaving only a T/block-step
    host of tiny carries (see ``_make_sosfilt_blocked``).
    """
    sos, zi = _butter_sos(order, float(low), float(high), float(sampling_rate))
    padlen = 3 * (2 * order + 1)
    t = x.shape[-1]
    if t <= padlen:
        raise ValueError(f"signal length {t} must exceed padlen {padlen}")
    sosfilt = _make_sosfilt_blocked(sos, zi, block)
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -padlen - 2 : -1]
    ext = jnp.concatenate([left, x, right], axis=-1)
    y = sosfilt(ext)
    y = jnp.flip(y, axis=-1)
    y = sosfilt(y)
    y = jnp.flip(y, axis=-1)
    return y[..., padlen : padlen + t]


def common_average_reference(x: jnp.ndarray, channel_axis: int = -2) -> jnp.ndarray:
    """Subtract the across-channel mean at each timepoint (CAR)."""
    return x - jnp.mean(x, axis=channel_axis, keepdims=True)


def zscore(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """Per-channel z-score: (x - mean) / (biased std + eps).

    Matches preprocess_eeg_windows.py:137-141 (np.std, ddof=0).
    """
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=axis, keepdims=True))
    return (x - mean) / (std + eps)


def sliding_windows(x: jnp.ndarray, window_size: int = 1024, stride: int = 512) -> jnp.ndarray:
    """Static sliding windows over the last axis.

    x: (..., C, T) -> (..., num_windows, C, window_size) where
    num_windows = (T - window_size) // stride + 1.  Pure index math —
    the gather compiles to strided slices.
    """
    t = x.shape[-1]
    if t < window_size:
        raise ValueError(f"T={t} < window_size={window_size}")
    n = (t - window_size) // stride + 1
    idx = np.arange(window_size)[None, :] + stride * np.arange(n)[:, None]  # (n, W)
    out = x[..., idx]  # (..., C, n, W)
    return jnp.moveaxis(out, -2, -3)


def preprocess_eeg(
    x: jnp.ndarray,
    sampling_rate: float = 250.0,
    low: float = 0.5,
    high: float = 50.0,
    order: int = 4,
    method: str = "blocked",
) -> jnp.ndarray:
    """Full pipeline: zero-phase Butterworth bandpass -> CAR -> z-score.

    x: (..., C, T).  Matches preprocess_eeg_windows.py:146-169.
    method: 'blocked' = scipy-parity filtfilt via block-parallel MXU
                        recurrence (default; fastest on TPU);
            'pscan'   = parallel associative scan (O(log T) depth);
            'scan'    = sequential lax.scan (reference implementation).
    """
    if method == "scan":
        x = bandpass_filtfilt_fir(x, low, high, sampling_rate, order)
    elif method == "pscan":
        x = bandpass_filtfilt_pscan(x, low, high, sampling_rate, order)
    else:
        x = bandpass_filtfilt_blocked(x, low, high, sampling_rate, order)
    x = common_average_reference(x)
    return zscore(x, axis=-1)
