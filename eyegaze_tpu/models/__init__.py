"""Flax model zoo: the TPU-native rebuild of the reference's 3_Models layer."""

from eyegaze_tpu.models.transformer import (
    MultiHeadAttention,
    FeedForward,
    TransformerEncoderBlock,
    TransformerEncoder,
    TransformerDecoderBlock,
    TransformerDecoder,
    PositionalEmbedding,
)
from eyegaze_tpu.models.dual_eeg import (
    TemporalConvFrontend,
    SpectrogramTokenGenerator,
    IBSTokenGenerator,
    RobustIBSTokenizer,
    SymmetricFusion,
    CrossBrainAttention,
    DualEEGTransformer,
)
from eyegaze_tpu.models.fuzzy_fusion import FuzzyGatingFusion, inverse_softplus
from eyegaze_tpu.models.vit import (
    VisionTransformer,
    EarlyFusionViT,
    LateFusionViT,
)
from eyegaze_tpu.models.art import (
    ArtifactRemovalTransformer,
    ArtConfig,
    art_loss,
)
from eyegaze_tpu.models.multimodal import MultimodalFusionModel
from eyegaze_tpu.models.torch_port import (
    port_art_state_dict,
    port_dual_eeg_state_dict,
    port_gaze_early_state_dict,
    port_gaze_late_state_dict,
    port_multimodal_state_dict,
)
