"""Signal-processing ops: the TPU performance core.

Everything here is pure-jnp (jit/vmap-friendly, static shapes) and replaces the
reference's per-trial NumPy/SciPy loops and the Python double loops in
``3_Models/backbones/dual_eeg_transformer.py:473-819``.
"""

from eyegaze_tpu.ops.spectral import (
    rfft_band_mask,
    bandpass_fft,
    hilbert_gain,
    analytic_band_parts,
    instantaneous_phase,
    dft_backend,
    stft,
    stft_magnitude,
    stft_log_magnitude,
    welch_psd,
    BAND_DEFS_4,
    BAND_DEFS_6,
)
from eyegaze_tpu.ops import dft
from eyegaze_tpu.ops.connectivity import (
    connectivity_matrices,
    connectivity_scalars,
    FEATURE_NAMES,
    BAND_NAMES_6,
    BAND_NAMES_4,
    feature_indices_for,
)
from eyegaze_tpu.ops.preprocess import (
    common_average_reference,
    zscore,
    sliding_windows,
    fir_bandpass_coeffs,
    bandpass_filtfilt_fir,
    bandpass_filtfilt_pscan,
    bandpass_filtfilt_blocked,
    preprocess_eeg,
)
from eyegaze_tpu.ops.entropy import (
    spatial_entropy,
    spectral_entropy,
    shannon_entropy_from_probs,
)
from eyegaze_tpu.ops.features import (
    FEATURE_BANDS_5,
    METRIC_NAMES,
    band_energy,
    inter_connectivity,
    intra_connectivity,
)
