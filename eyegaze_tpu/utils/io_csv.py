"""CSV export layer — the data contract with the MATLAB figure suite.

Schema-compatible rebuild of ``6_Utils/io_utils.py:18-372``: same directory
tree, same column names/order, headerless %.6f matrices for MATLAB
``readmatrix()``.  Existing MATLAB scripts under 7_Analysis/matlab_scripts
can consume these outputs unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd

PathLike = Union[str, Path]


def ensure_output_dirs(base_path: PathLike) -> Dict[str, Path]:
    base = Path(base_path)
    subdirs = {
        "core_metrics": base / "core_metrics",
        "frequency_sensitivity": base / "frequency_sensitivity",
        "ibs_connectivity": base / "ibs_connectivity",
        "ibs_mean_by_class": base / "ibs_connectivity" / "ibs_mean_by_class",
        "ibs_difference": base / "ibs_connectivity" / "ibs_difference_coop_vs_comp",
        "attention_weights": base / "attention_weights",
        "attention_mean_by_class": base / "attention_weights" / "attention_mean_by_class",
        "feature_embeddings": base / "feature_embeddings",
        "gradcam": base / "gradcam",
        "gradcam_mean_by_class": base / "gradcam" / "gradcam_mean_by_class",
    }
    for p in subdirs.values():
        p.mkdir(parents=True, exist_ok=True)
    return subdirs


def save_confusion_matrix(cm: np.ndarray, path: PathLike, class_names: List[str]) -> None:
    """Rows True_<cls>, columns Predicted_<cls>."""
    df = pd.DataFrame(
        np.asarray(cm),
        index=[f"True_{n}" for n in class_names],
        columns=[f"Predicted_{n}" for n in class_names],
    )
    df.to_csv(path)


def save_classification_report(
    y_true: np.ndarray, y_pred: np.ndarray, path: PathLike, class_names: List[str]
) -> pd.DataFrame:
    """Columns: Class, Precision, Recall, F1, Support (zero_division=0)."""
    from eyegaze_tpu.train.metrics import confusion_matrix, per_class_metrics
    import jax.numpy as jnp

    cm = confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), len(class_names))
    pc = per_class_metrics(cm)
    df = pd.DataFrame(
        {
            "Class": class_names,
            "Precision": np.asarray(pc["precision"]),
            "Recall": np.asarray(pc["recall"]),
            "F1": np.asarray(pc["f1"]),
            "Support": np.asarray(pc["support"]).astype(int),
        }
    )
    df.to_csv(path, index=False)
    return df


def save_overall_metrics(metrics: Dict[str, float], path: PathLike) -> None:
    pd.DataFrame([{"Metric": k, "Value": v} for k, v in metrics.items()]).to_csv(
        path, index=False
    )


def save_frequency_sensitivity(
    sensitivity_data: Dict[str, Dict[str, float]],
    path: PathLike,
    baseline_accuracy: float,
    baseline_f1: float,
) -> None:
    rows = [
        {
            "Band": band,
            "Masked_Accuracy": m["accuracy"],
            "Masked_F1": m["f1"],
            "Accuracy_Drop": baseline_accuracy - m["accuracy"],
            "F1_Drop": baseline_f1 - m["f1"],
        }
        for band, m in sensitivity_data.items()
    ]
    pd.DataFrame(rows).to_csv(path, index=False)


def save_ibs_long_format(ibs_data: List[Dict], path: PathLike) -> None:
    """Columns: Subject_ID, True_Label, Pred_Label, Band, Feature, Channel_1,
    Channel_2, Value."""
    pd.DataFrame(ibs_data).to_csv(path, index=False)


def save_ibs_matrix(matrix: np.ndarray, path: PathLike) -> None:
    """Headerless %.6f CxC matrix for MATLAB readmatrix()."""
    np.savetxt(path, np.asarray(matrix), delimiter=",", fmt="%.6f")


def save_channel_names(channel_names: List[str], path: PathLike) -> None:
    pd.DataFrame(
        {"Index": list(range(len(channel_names))), "Channel_Name": channel_names}
    ).to_csv(path, index=False)


def save_attention_summary(summary_data: List[Dict], path: PathLike) -> None:
    pd.DataFrame(summary_data).to_csv(path, index=False)


def save_attention_matrix(matrix: np.ndarray, path: PathLike) -> None:
    np.savetxt(path, np.asarray(matrix), delimiter=",", fmt="%.6f")


def save_embedding_results(embedding_df: pd.DataFrame, path: PathLike) -> None:
    embedding_df.to_csv(path, index=False)


def save_gradcam_results(gradcam_matrix: np.ndarray, path: PathLike) -> None:
    np.savetxt(path, np.asarray(gradcam_matrix), delimiter=",", fmt="%.6f")


def save_gradcam_metadata(
    freq_axis: np.ndarray,
    time_axis: np.ndarray,
    path: PathLike,
    sampling_rate: int = 256,
    n_fft: int = 128,
    hop_length: int = 64,
) -> None:
    rows = [
        {"Axis": "Frequency_Hz", "Index": i, "Value": f} for i, f in enumerate(freq_axis)
    ]
    rows += [{"Axis": "Time_Sec", "Index": i, "Value": t} for i, t in enumerate(time_axis)]
    rows += [
        {"Axis": "Param", "Index": "sampling_rate", "Value": sampling_rate},
        {"Axis": "Param", "Index": "n_fft", "Value": n_fft},
        {"Axis": "Param", "Index": "hop_length", "Value": hop_length},
    ]
    pd.DataFrame(rows).to_csv(path, index=False)


def save_predictions(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    y_prob: Optional[np.ndarray],
    path: PathLike,
    class_names: List[str],
    sample_ids: Optional[List] = None,
) -> None:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    data = {
        "Sample_ID": sample_ids if sample_ids else list(range(len(y_true))),
        "True_Label": [class_names[int(y)] for y in y_true],
        "Pred_Label": [class_names[int(y)] for y in y_pred],
        "True_Label_ID": y_true,
        "Pred_Label_ID": y_pred,
        "Correct": (y_true == y_pred).astype(int),
    }
    if y_prob is not None:
        for i, name in enumerate(class_names):
            data[f"Prob_{name}"] = y_prob[:, i]
    pd.DataFrame(data).to_csv(path, index=False)
