"""Literal NumPy/SciPy port of the OFFLINE feature-extraction semantics.

Mirrors ``/root/reference/2_Preprocessing/scripts/extract_eeg_features.py``
(:120-760) formula for formula — scipy butter+filtfilt bandpass, scipy
hilbert, sign(sin) PLI, true wPLI, segment-averaged coherence, circular phase
means.  TEST-ONLY golden reference for ``eyegaze_tpu.ops.features``.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import butter, filtfilt, hilbert

BANDS_5 = {
    "delta": (0.5, 4),
    "theta": (4, 7),
    "alpha": (8, 12),
    "beta": (12, 28),
    "gamma": (28, 50),
}


def bandpass_filter(eeg, low, high, fs, order=4):
    nyq = fs / 2
    b, a = butter(order, [low / nyq, min(high / nyq, 0.99)], btype="band")
    return filtfilt(b, a, eeg, axis=1).astype(np.float32)


def analytic(band_signal):
    a = hilbert(band_signal, axis=1)
    return np.abs(a).astype(np.float32), np.angle(a).astype(np.float32)


def pearson(x):
    xn = (x - x.mean(axis=1, keepdims=True)) / (x.std(axis=1, keepdims=True) + 1e-8)
    return (xn @ xn.T) / x.shape[1]


def inter_pearson(a, b):
    an = (a - a.mean(axis=1, keepdims=True)) / (a.std(axis=1, keepdims=True) + 1e-8)
    bn = (b - b.mean(axis=1, keepdims=True)) / (b.std(axis=1, keepdims=True) + 1e-8)
    return (an @ bn.T) / a.shape[1]


def plv(pa, pb):
    d = pa[:, None, :] - pb[None, :, :]
    return np.abs(np.exp(1j * d).mean(axis=2))


def pli(pa, pb):
    d = pa[:, None, :] - pb[None, :, :]
    return np.abs(np.sign(np.sin(d)).mean(axis=2))


def wpli(pa, pb):
    d = pa[:, None, :] - pb[None, :, :]
    sin_d = np.sin(d)
    num = np.abs((np.abs(sin_d) * np.sign(sin_d)).mean(axis=2))
    den = np.abs(sin_d).mean(axis=2) + 1e-8
    return num / den


def coherence(a, b, fs=250, nperseg=256):
    c, t = a.shape
    n_seg = t // nperseg
    win = np.hanning(nperseg).astype(np.float32)
    seg_a = a[:, : n_seg * nperseg].reshape(c, n_seg, nperseg) * win
    seg_b = b[:, : n_seg * nperseg].reshape(c, n_seg, nperseg) * win
    xa = np.fft.rfft(seg_a, axis=2)
    xb = np.fft.rfft(seg_b, axis=2)
    paa = (np.abs(xa) ** 2).mean(axis=1)
    pbb = (np.abs(xb) ** 2).mean(axis=1)
    pab = np.einsum("isf,jsf->ijf", xa, np.conj(xb)) / n_seg
    coh = np.abs(pab) ** 2 / (paa[:, None, :] * pbb[None, :, :] + 1e-8)
    return coh.mean(axis=2).real


def phase_diff(pa, pb):
    d = pa[:, None, :] - pb[None, :, :]
    return np.angle(np.exp(1j * d).mean(axis=2))


def inter_connectivity(eeg1, eeg2, fs=250, bands=BANDS_5, nperseg=256):
    """(7, 5, C, C) metrics x bands, extract_eeg_features.py:713-760."""
    c = eeg1.shape[0]
    out = np.zeros((7, len(bands), c, c), np.float32)
    for bi, (name, (lo, hi)) in enumerate(bands.items()):
        b1 = bandpass_filter(eeg1, lo, hi, fs)
        b2 = bandpass_filter(eeg2, lo, hi, fs)
        amp1, ph1 = analytic(b1)
        amp2, ph2 = analytic(b2)
        out[0, bi] = inter_pearson(b1, b2)
        out[1, bi] = inter_pearson(amp1, amp2)
        out[2, bi] = plv(ph1, ph2)
        out[3, bi] = pli(ph1, ph2)
        out[4, bi] = wpli(ph1, ph2)
        out[5, bi] = coherence(b1, b2, fs, nperseg)
        out[6, bi] = phase_diff(ph1, ph2)
    return out


def intra_connectivity(eeg, fs=250, bands=BANDS_5, nperseg=256):
    c = eeg.shape[0]
    out = np.zeros((7, len(bands), c, c), np.float32)
    for bi, (name, (lo, hi)) in enumerate(bands.items()):
        b = bandpass_filter(eeg, lo, hi, fs)
        amp, ph = analytic(b)
        out[0, bi] = pearson(b)
        out[1, bi] = pearson(amp)
        out[2, bi] = plv(ph, ph)
        out[3, bi] = pli(ph, ph)
        out[4, bi] = wpli(ph, ph)
        out[5, bi] = coherence(b, b, fs, nperseg)
        out[6, bi] = phase_diff(ph, ph)
    return out
