"""Analysis layer: model introspection, embeddings, error analysis, comparison."""

from eyegaze_tpu.analysis.eeg_introspect import (
    run_inference,
    extract_ibs_matrices,
    frequency_sensitivity,
    extract_attention_maps,
    extract_embeddings,
    gradcam_spectrogram,
    BAND_NAMES,
    FEATURE_NAMES,
    STANDARD_32_CHANNELS,
    CHANNEL_POSITIONS_2D,
)
from eyegaze_tpu.analysis.embedding import tsne_embed, pca_embed, umap_embed
from eyegaze_tpu.analysis.gaze_introspect import (
    input_saliency,
    vit_gradcam,
    extract_cls_features,
    denormalize_image,
)
from eyegaze_tpu.analysis.error_analysis import ErrorAnalyzer, MechanismAnalyzer
from eyegaze_tpu.analysis.comparison import ModelResults, MultiModelComparator
from eyegaze_tpu.analysis.learning_curves import LearningCurveAnalyzer
from eyegaze_tpu.analysis.matlab_parity import (
    render_all_suites,
    render_attention_suite,
    render_entropy_suite,
    render_frequency_sensitivity_bar,
    render_gradcam_suite,
    render_ibs_suite,
)
