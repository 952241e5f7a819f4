"""Host-side data layer: metadata, splits, synthetic fixtures, batch loaders."""

from eyegaze_tpu.data.metadata import (
    load_metadata,
    verify_metadata,
    generate_metadata,
    pair_split,
    stratified_split,
    class_weights,
    LABEL2ID,
    ID2LABEL,
    CLASS_NAMES,
)
from eyegaze_tpu.data.synthetic import (
    gen_eeg,
    synthetic_eeg_pair_dataset,
    synthetic_gaze_heatmap,
    synthetic_gaze_pair_dataset,
    synthetic_metadata,
)
from eyegaze_tpu.data.windows import window_index, WindowIndex
from eyegaze_tpu.data.loader import (
    ArrayDataset,
    batch_iterator,
    DualEEGWindowDataset,
    GazePairArrays,
    MultimodalArrays,
)
from eyegaze_tpu.data.prefetch import prefetch_to_device
from eyegaze_tpu.data.image_fusion import (
    imagenet_normalize,
    fuse_image_pair,
    resize_bilinear,
    to_unit_float,
)
from eyegaze_tpu.data.images import (
    convert_gaze_images,
    load_converted_gaze,
    load_gaze_pairs,
    load_image,
)
from eyegaze_tpu.data.gaze_augment import (
    augment_gaze_pair,
    random_horizontal_flip,
    color_jitter,
)
from eyegaze_tpu.data.augment import augment_eeg
from eyegaze_tpu.data.art_data import build_art_datasets, read_eeg
