"""Literal NumPy port of the reference's connectivity/spectral semantics.

This file intentionally mirrors, loop for loop and reduction for reduction,
the torch code in ``/root/reference/3_Models/backbones/dual_eeg_transformer.py``
(IBSTokenGenerator :178-470 and IBSConnectivityMatrixGenerator :473-819) so
the vectorized TPU kernels in ``eyegaze_tpu.ops`` can be golden-tested against
it.  It is TEST-ONLY code — slow on purpose, never imported by the framework.

torch-specific conventions reproduced here:
- ``torch.std`` is UNBIASED (ddof=1);
- phase differences are raw (unwrapped) differences of FFT-Hilbert phases;
- scalar phase_diff = |mean(dphi)| but matrix phase_diff = mean(|dphi|).
"""

from __future__ import annotations

import numpy as np

BANDS_4 = {"theta": (4, 8), "alpha": (8, 13), "beta": (13, 30), "gamma": (30, 45)}
BANDS_6 = {
    "broadband": (0.5, 45),
    "delta": (0.5, 4),
    "theta": (4, 8),
    "alpha": (8, 13),
    "beta": (13, 30),
    "gamma": (30, 45),
}


def bandpass_filter_fft(signal, low, high, fs):
    """dual_eeg_transformer.py:527-560."""
    t = signal.shape[-1]
    fft_signal = np.fft.rfft(signal, axis=-1)
    freqs = np.fft.rfftfreq(t, d=1.0 / fs)
    mask = ((freqs >= low) & (freqs <= high)).astype(np.float64)
    return np.fft.irfft(fft_signal * mask, n=t, axis=-1)


def compute_phase(signal):
    """FFT Hilbert phase, dual_eeg_transformer.py:562-591."""
    t = signal.shape[-1]
    fft_signal = np.fft.fft(signal, axis=-1)
    h = np.zeros(t)
    if t % 2 == 0:
        h[0] = h[t // 2] = 1
        h[1 : t // 2] = 2
    else:
        h[0] = 1
        h[1 : (t + 1) // 2] = 2
    analytic = np.fft.ifft(fft_signal * h, axis=-1)
    return np.angle(analytic)


def _std_unbiased(x, axis):
    return np.std(x, axis=axis, ddof=1, keepdims=True)


# ---------------------------------------------------------------------------
# Matrix variants (IBSConnectivityMatrixGenerator :593-758)
# ---------------------------------------------------------------------------

def plv_matrix(phase1, phase2):
    b, c, t = phase1.shape
    out = np.zeros((b, c, c))
    for i in range(c):
        for j in range(c):
            d = phase1[:, i, :] - phase2[:, j, :]
            out[:, i, j] = np.abs(np.mean(np.exp(1j * d), axis=1))
    return out


def pli_matrix(phase1, phase2):
    b, c, t = phase1.shape
    out = np.zeros((b, c, c))
    for i in range(c):
        for j in range(c):
            d = phase1[:, i, :] - phase2[:, j, :]
            out[:, i, j] = np.abs(np.mean(np.sign(d), axis=1))
    return out


def wpli_matrix(phase1, phase2, power1, power2):
    b, c, t = phase1.shape
    out = np.zeros((b, c, c))
    for i in range(c):
        for j in range(c):
            d = phase1[:, i, :] - phase2[:, j, :]
            w = (power1[:, i, :] + power2[:, j, :]) / 2
            w = w / (w.sum(axis=1, keepdims=True) + 1e-8)
            out[:, i, j] = np.abs((np.sign(d) * w).sum(axis=1))
    return out


def coherence_matrix(eeg1, eeg2):
    b, c, t = eeg1.shape
    out = np.zeros((b, c, c))
    fft1 = np.fft.rfft(eeg1, axis=2)
    fft2 = np.fft.rfft(eeg2, axis=2)
    for i in range(c):
        for j in range(c):
            pxy = fft1[:, i, :] * np.conj(fft2[:, j, :])
            pxx = (fft1[:, i, :] * np.conj(fft1[:, i, :])).real
            pyy = (fft2[:, j, :] * np.conj(fft2[:, j, :])).real
            coh = np.abs(pxy) ** 2 / (pxx * pyy + 1e-8)
            out[:, i, j] = coh.mean(axis=1)
    return out


def power_corr_matrix(power1, power2):
    b, c, t = power1.shape
    out = np.zeros((b, c, c))
    for i in range(c):
        for j in range(c):
            p1 = power1[:, i, :]
            p2 = power2[:, j, :]
            z1 = (p1 - p1.mean(axis=1, keepdims=True)) / (_std_unbiased(p1, 1) + 1e-8)
            z2 = (p2 - p2.mean(axis=1, keepdims=True)) / (_std_unbiased(p2, 1) + 1e-8)
            out[:, i, j] = (z1 * z2).mean(axis=1)
    return out


def phase_diff_matrix(phase1, phase2):
    b, c, t = phase1.shape
    out = np.zeros((b, c, c))
    for i in range(c):
        for j in range(c):
            out[:, i, j] = np.abs(phase1[:, i, :] - phase2[:, j, :]).mean(axis=1)
    return out


def time_corr_matrix(eeg1, eeg2):
    b, c, t = eeg1.shape
    out = np.zeros((b, c, c))
    for i in range(c):
        for j in range(c):
            s1 = eeg1[:, i, :]
            s2 = eeg2[:, j, :]
            z1 = (s1 - s1.mean(axis=1, keepdims=True)) / (_std_unbiased(s1, 1) + 1e-8)
            z2 = (s2 - s2.mean(axis=1, keepdims=True)) / (_std_unbiased(s2, 1) + 1e-8)
            out[:, i, j] = (z1 * z2).mean(axis=1)
    return out


def connectivity_matrices(eeg1, eeg2, fs=256.0, bands=BANDS_6):
    """IBSConnectivityMatrixGenerator.forward (:760-819): (B, nb, 7, C, C)."""
    b, c, t = eeg1.shape
    nb = len(bands)
    out = np.zeros((b, nb, 7, c, c))
    for bi, (name, (lo, hi)) in enumerate(bands.items()):
        e1 = bandpass_filter_fft(eeg1, lo, hi, fs)
        e2 = bandpass_filter_fft(eeg2, lo, hi, fs)
        p1, p2 = e1**2, e2**2
        ph1, ph2 = compute_phase(e1), compute_phase(e2)
        out[:, bi, 0] = plv_matrix(ph1, ph2)
        out[:, bi, 1] = pli_matrix(ph1, ph2)
        out[:, bi, 2] = wpli_matrix(ph1, ph2, p1, p2)
        out[:, bi, 3] = coherence_matrix(e1, e2)
        out[:, bi, 4] = power_corr_matrix(p1, p2)
        out[:, bi, 5] = phase_diff_matrix(ph1, ph2)
        out[:, bi, 6] = time_corr_matrix(e1, e2)
    return out


# ---------------------------------------------------------------------------
# Scalar variants (IBSTokenGenerator :259-470)
# ---------------------------------------------------------------------------

def connectivity_scalars(eeg1, eeg2, fs=256.0, bands=BANDS_4):
    """IBSTokenGenerator.forward feature stack: (B, len(bands)*7)."""
    b = eeg1.shape[0]
    feats = []
    for name, (lo, hi) in bands.items():
        e1 = bandpass_filter_fft(eeg1, lo, hi, fs)
        e2 = bandpass_filter_fft(eeg2, lo, hi, fs)
        p1, p2 = e1**2, e2**2
        ph1, ph2 = compute_phase(e1), compute_phase(e2)
        d = ph1 - ph2
        plv = np.abs(np.mean(np.exp(1j * d), axis=(1, 2)))
        pli = np.abs(np.sign(d).mean(axis=(1, 2)))
        w = (p1 + p2) / 2
        w = w / (w.sum(axis=(1, 2), keepdims=True) + 1e-8)
        wpli = np.abs((np.sign(d) * w).sum(axis=(1, 2)))
        fft1 = np.fft.rfft(e1, axis=2)
        fft2 = np.fft.rfft(e2, axis=2)
        pxy = (fft1 * np.conj(fft2)).mean(axis=1)
        pxx = (fft1 * np.conj(fft1)).mean(axis=1).real
        pyy = (fft2 * np.conj(fft2)).mean(axis=1).real
        coh = (np.abs(pxy) ** 2 / (pxx * pyy + 1e-8)).mean(axis=1)
        pf1 = p1.reshape(b, -1)
        pf2 = p2.reshape(b, -1)
        z1 = (pf1 - pf1.mean(axis=1, keepdims=True)) / (_std_unbiased(pf1, 1) + 1e-8)
        z2 = (pf2 - pf2.mean(axis=1, keepdims=True)) / (_std_unbiased(pf2, 1) + 1e-8)
        pcorr = (z1 * z2).mean(axis=1)
        pdiff = np.abs(np.mean(d, axis=(1, 2)))
        m1 = e1.mean(axis=1)
        m2 = e2.mean(axis=1)
        zm1 = (m1 - m1.mean(axis=1, keepdims=True)) / (_std_unbiased(m1, 1) + 1e-8)
        zm2 = (m2 - m2.mean(axis=1, keepdims=True)) / (_std_unbiased(m2, 1) + 1e-8)
        tcorr = (zm1 * zm2).mean(axis=1)
        feats.extend([plv, pli, wpli, coh, pcorr, pdiff, tcorr])
    return np.stack(feats, axis=1)


def torch_stft_magnitude(x, n_fft=128, hop=64):
    """torch.stft(center=True, reflect, hann periodic, onesided) |.|.

    x: (N, T) -> (N, F, frames).
    """
    import numpy.lib.stride_tricks as st

    n, t = x.shape
    pad = n_fft // 2
    xp = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (xp.shape[1] - n_fft) // hop
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    frames = np.stack([xp[:, i * hop : i * hop + n_fft] for i in range(n_frames)], axis=1)
    spec = np.fft.rfft(frames * win, axis=-1)  # (N, frames, F)
    return np.abs(spec).transpose(0, 2, 1)
