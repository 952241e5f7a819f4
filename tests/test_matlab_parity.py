"""Native MATLAB figure-suite renderers (analysis/matlab_parity.py).

Each suite must reproduce the artifact set of its reference ``.m`` script
(same filenames, same derived CSV content) from the CSV tree that
``scripts/analyze_eeg.py`` writes.  References:
``7_Analysis/matlab_scripts/analyze_ibs_connectivity.m`` (8 artifacts),
``analyze_attention_weights.m`` (8), ``analyze_gradcam.m`` (10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from eyegaze_tpu.analysis.matlab_parity import (
    BANDS_6,
    CLASSES,
    ROI_CHANNELS,
    ROI_NAMES,
    _movmean,
    render_all_suites,
    render_attention_suite,
    render_gradcam_suite,
    render_ibs_suite,
)
from eyegaze_tpu.utils import io_csv

N_CH = 32
SEQ = 139
CHANNELS = ["Fp1", "Fz", "F3", "F7", "FT9", "FC5", "FC1", "C3",
            "T7", "TP9", "CP5", "CP1", "PZ", "P3", "P7", "O1",
            "OZ", "O2", "P4", "P8", "TP10", "CP6", "CP2", "CZ",
            "C4", "T8", "FT10", "FC6", "FC2", "F4", "F8", "FP2"]


@pytest.fixture
def result_tree(tmp_path):
    """Synthetic analyze_eeg.py output tree via the real io_csv savers."""
    rng = np.random.default_rng(7)
    dirs = io_csv.ensure_output_dirs(tmp_path)
    io_csv.save_channel_names(CHANNELS,
                              dirs["ibs_connectivity"] / "channel_names.csv")
    mats = {}
    for cname in CLASSES:
        for band in BANDS_6:
            m = rng.uniform(0.2, 0.9, size=(N_CH, N_CH))
            mats[(cname, band)] = m
            io_csv.save_ibs_matrix(
                m, dirs["ibs_mean_by_class"] / f"{cname}_{band}_PLV.csv")
    for band in BANDS_6:
        diff = mats[("Cooperation", band)] - mats[("Competition", band)]
        io_csv.save_ibs_matrix(
            diff, dirs["ibs_difference"] / f"diff_{band}_PLV.csv")

    attn = rng.uniform(0, 0.01, size=(SEQ, SEQ))
    attn[np.diag_indices(SEQ)] += 0.02  # diagonal dominance, like sync attn
    io_csv.save_attention_matrix(
        attn, dirs["attention_weights"] / "mean_attention.csv")
    io_csv.save_attention_summary(
        [{"Class": c, "Mean_Diagonal": 0.02 + 0.001 * i,
          "Std_Diagonal": 0.001, "Mean_OffDiag": 0.005, "Std_OffDiag": 0.001}
         for i, c in enumerate(CLASSES)],
        dirs["attention_weights"] / "attention_summary.csv")

    for cname in CLASSES:
        cam = rng.uniform(0, 1, size=(64, 64))
        io_csv.save_gradcam_results(
            cam, dirs["gradcam_mean_by_class"] / f"gradcam_{cname}.csv")
    io_csv.save_gradcam_metadata(np.linspace(0, 128, 64),
                                 np.linspace(0, 4, 64),
                                 dirs["gradcam"] / "gradcam_metadata.csv")
    return tmp_path, mats, attn


IBS_ARTIFACTS = {
    "ibs_heatmap_3classes.png", "ibs_diff_heatmap.png",
    "ibs_circular_graph.png", "ibs_roi_analysis.png",
    "ibs_multiband_comparison.png", "ibs_summary.png",
    "ibs_roi_stats.csv", "ibs_band_stats.csv",
}
ATTN_ARTIFACTS = {
    "attention_heatmap.png", "attention_diagonal_profile.png",
    "attention_class_comparison.png", "attention_timelag_analysis.png",
    "attention_distribution.png", "attention_summary.png",
    "attention_statistics.csv", "attention_lag_profile.csv",
}
GRADCAM_ARTIFACTS = {
    "gradcam_heatmap_comparison.png", "gradcam_difference_maps.png",
    "gradcam_frequency_profile.png", "gradcam_temporal_profile.png",
    "gradcam_band_statistics.png", "gradcam_3d_surface.png",
    "gradcam_summary.png", "gradcam_band_stats.csv",
    "gradcam_frequency_profile.csv", "gradcam_temporal_profile.csv",
}


def test_movmean_matches_matlab_semantics():
    """movmean(x, k): centered window that SHRINKS at the edges."""
    x = np.arange(10.0) ** 2
    got = _movmean(x, 5)
    want = np.array([np.mean(x[max(0, i - 2):min(10, i + 3)])
                     for i in range(10)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_ibs_suite_artifacts_and_stats(result_tree, tmp_path):
    root, mats, _ = result_tree
    out = tmp_path / "figs_ibs"
    produced = render_ibs_suite(root, out, key_band="theta",
                                key_feature="PLV")
    assert set(produced) == IBS_ARTIFACTS
    for p in produced.values():
        assert p.exists() and p.stat().st_size > 0

    # ibs_band_stats.csv rows = global mean of each band's class matrix
    # (analyze_ibs_connectivity.m:381-487).
    band_df = pd.read_csv(out / "ibs_band_stats.csv", index_col=0)
    for band in BANDS_6:
        for cname in CLASSES:
            # %.6f CSV quantization bounds the round-trip error.
            assert band_df.loc[band, cname] == pytest.approx(
                mats[(cname, band)].mean(), abs=2e-6)

    # ibs_roi_stats.csv diagonal = same-region ROI mean of the key-band
    # matrix (m:296-311 semantics: mean over the ROI submatrix).
    roi_df = pd.read_csv(out / "ibs_roi_stats.csv", index_col=0)
    idx = [i for i, ch in enumerate(CHANNELS)
           if any(ch.lower() == r.lower() for r in ROI_CHANNELS["Frontal"])]
    want = mats[("Single", "theta")][np.ix_(idx, idx)].mean()
    assert roi_df.loc["Single", "Frontal"] == pytest.approx(want, abs=2e-6)
    assert list(roi_df.columns) == list(ROI_NAMES)


def test_attention_suite_artifacts_and_lag_profile(result_tree, tmp_path):
    root, _, attn = result_tree
    out = tmp_path / "figs_attn"
    produced = render_attention_suite(root, out)
    assert set(produced) == ATTN_ARTIFACTS

    # Lag profile at lag=0 must equal the diagonal mean; lag k the k-th
    # superdiagonal mean (analyze_attention_weights.m:362-374).
    lag_df = pd.read_csv(out / "attention_lag_profile.csv")
    attn_r = np.loadtxt(root / "attention_weights" / "mean_attention.csv",
                        delimiter=",")
    zero = lag_df[lag_df.Lag == 0].Mean_Attention.iloc[0]
    assert zero == pytest.approx(np.diag(attn_r).mean(), rel=1e-6)
    five = lag_df[lag_df.Lag == 5].Mean_Attention.iloc[0]
    assert five == pytest.approx(np.diag(attn_r, 5).mean(), rel=1e-6)
    assert lag_df.Lag.min() == -50 and lag_df.Lag.max() == 50

    # Statistics CSV: the diag/off-diag ratio is derivable from the matrix.
    stats = pd.read_csv(out / "attention_statistics.csv").set_index("Metric")
    off = attn_r[~np.eye(len(attn_r), dtype=bool)]
    want = np.diag(attn_r).mean() / off.mean()
    assert float(stats.loc["Diag_OffDiag_Ratio", "Value"]) == pytest.approx(
        want, abs=1e-3)
    # Diagonal dominance in the fixture must be detected.
    assert want > 1.5


def test_attention_suite_accepts_matlab_filenames(result_tree, tmp_path):
    """The renderer reads the .m script's expected names too
    (mean_attention_map.csv / attention_diagonal_summary.csv)."""
    root, _, _ = result_tree
    d = root / "attention_weights"
    (d / "mean_attention.csv").rename(d / "mean_attention_map.csv")
    pd.DataFrame({
        "Class": list(CLASSES),
        "Mean_Diagonal_Value": [0.021, 0.022, 0.023],
        "Sample_Count": [10, 10, 10],
    }).to_csv(d / "attention_diagonal_summary.csv", index=False)
    (d / "attention_summary.csv").unlink()
    produced = render_attention_suite(root, tmp_path / "figs_attn2")
    assert set(produced) == ATTN_ARTIFACTS


def test_gradcam_suite_artifacts_and_band_stats(result_tree, tmp_path):
    root, _, _ = result_tree
    out = tmp_path / "figs_cam"
    produced = render_gradcam_suite(root, out)
    assert set(produced) == GRADCAM_ARTIFACTS

    # Band stats = mean over the band's bin rows (analyze_gradcam.m:361-369),
    # bins resolved from the metadata frequency axis.
    cam = np.loadtxt(root / "gradcam" / "gradcam_mean_by_class" /
                     "gradcam_Single.csv", delimiter=",")
    band_df = pd.read_csv(out / "gradcam_band_stats.csv", index_col=0)
    freq_res = 128.0 / 63.0  # np.linspace(0, fs/2, 64) spacing
    lo = max(0, int(np.floor(4.0 / freq_res)))
    hi = min(63, int(np.ceil(8.0 / freq_res)) - 1)
    assert band_df.loc["Theta", "Single"] == pytest.approx(
        cam[lo:hi + 1, :].mean(), rel=1e-6)

    # Profile CSVs carry the metadata axes and per-class means.
    freq_df = pd.read_csv(out / "gradcam_frequency_profile.csv")
    assert list(freq_df.columns) == ["Frequency_Hz", *CLASSES]
    np.testing.assert_allclose(freq_df["Single"], cam.mean(axis=1),
                               rtol=1e-6)
    temp_df = pd.read_csv(out / "gradcam_temporal_profile.csv")
    np.testing.assert_allclose(temp_df["Single"], cam.mean(axis=0),
                               rtol=1e-6)
    assert temp_df["Time_ms"].iloc[-1] == pytest.approx(4000.0)


ENTROPY_ARTIFACTS = {
    "fig_gaze_raincloud.png",
    "fig_gaze_entropy_by_pair_sorted_horizontal.png",
    "fig_eeg_raincloud.png", "eeg_entropy_raincloud.png",
    "eeg_entropy_boxplot_sorted.png", "fig_eeg_channel_heatmap.png",
    "eeg_entropy_topoplot.png", "fig_correlation.png",
}


@pytest.fixture
def entropy_tree(tmp_path):
    """Synthetic analyze_entropy.py output: long-format gaze + EEG CSVs with
    pair/player/trial/condition keys and per-channel EEG columns."""
    rng = np.random.default_rng(3)
    rows_g, rows_e = [], []
    chans = CHANNELS[:8]
    for pair in (12, 13, 14):
        for cond in CLASSES:
            for trial in range(4):
                for player in ("A", "B"):
                    key = dict(pair_id=pair, player=player,
                               trial_idx=trial + 1, condition=cond)
                    rows_g.append({**key,
                                   "spatial_entropy": rng.uniform(4, 7)})
                    row = {**key, "mean_entropy": rng.uniform(0.5, 0.9)}
                    row.update({c: rng.uniform(0.4, 1.0) for c in chans})
                    rows_e.append(row)
    pd.DataFrame(rows_g).to_csv(tmp_path / "gaze_entropy_raw.csv",
                                index=False)
    pd.DataFrame(rows_e).to_csv(tmp_path / "eeg_entropy_raw.csv",
                                index=False)
    positions = {c: (np.cos(i), np.sin(i)) for i, c in enumerate(chans)}
    return tmp_path, positions


def test_entropy_suite_artifacts(entropy_tree, tmp_path):
    root, positions = entropy_tree
    from eyegaze_tpu.analysis.matlab_parity import render_entropy_suite

    produced = render_entropy_suite(root, tmp_path / "figs",
                                    positions=positions)
    assert set(produced) == ENTROPY_ARTIFACTS
    for p in produced.values():
        assert p.exists() and p.stat().st_size > 0


def test_entropy_suite_gaze_only(entropy_tree, tmp_path):
    """EEG CSV absent -> only the gaze figures render, no error
    (per-section existence guards like analyze_gaze.m)."""
    root, _ = entropy_tree
    (root / "eeg_entropy_raw.csv").unlink()
    from eyegaze_tpu.analysis.matlab_parity import render_entropy_suite

    produced = render_entropy_suite(root, tmp_path / "figs2")
    assert set(produced) == {
        "fig_gaze_raincloud.png",
        "fig_gaze_entropy_by_pair_sorted_horizontal.png"}


def test_frequency_sensitivity_bar(tmp_path):
    from eyegaze_tpu.analysis.matlab_parity import (
        render_frequency_sensitivity_bar,
    )

    csv = tmp_path / "band_sensitivity.csv"
    pd.DataFrame({
        "Band": ["delta", "theta", "alpha"],
        "Masked_Accuracy": [0.8, 0.7, 0.9],
        "Masked_F1": [0.78, 0.66, 0.9],
        "Accuracy_Drop": [0.1, 0.2, 0.0],
        "F1_Drop": [0.12, 0.24, 0.0],
    }).to_csv(csv, index=False)
    out = render_frequency_sensitivity_bar(csv, tmp_path / "freq.png")
    assert out.exists() and out.stat().st_size > 0


def test_render_all_suites_skips_missing(tmp_path):
    """A tree with only gradcam inputs renders that suite and reports the
    others empty, like running only one .m script."""
    dirs = io_csv.ensure_output_dirs(tmp_path / "partial")
    rng = np.random.default_rng(0)
    for cname in CLASSES:
        io_csv.save_gradcam_results(
            rng.uniform(size=(64, 64)),
            dirs["gradcam_mean_by_class"] / f"gradcam_{cname}.csv")
    produced = render_all_suites(tmp_path / "partial", tmp_path / "figs")
    assert set(produced["gradcam"]) == GRADCAM_ARTIFACTS
    assert produced["ibs_connectivity"] == {}
    assert produced["attention_weights"] == {}
