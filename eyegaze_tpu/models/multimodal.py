"""Multimodal gaze+EEG model with fuzzy-gating decision fusion.

Rebuild of ``MultimodalFusionModel``
(``4_Experiments/scripts/train_multimodal_fuzzy_fusion.py:106-179``):
gaze encoder (EarlyFusionViT) -> img logits, EEG encoder (DualEEGTransformer)
-> eeg logits, FuzzyGatingFusion -> fused logits + alpha + aux info.

Encoder freezing is handled at the optimizer level (optax.multi_transform zero
updates — see eyegaze_tpu.train.optim.make_optimizer) rather than with
requires_grad, which is the idiomatic JAX equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
from eyegaze_tpu.models.fuzzy_fusion import FuzzyGatingFusion
from eyegaze_tpu.models.vit import EarlyFusionViT

Dtype = jnp.dtype


class MultimodalFusionModel(nn.Module):
    num_classes: int = 3
    gaze_fusion_mode: str = "concat"
    fuzzy_mode: str = "full"
    # EEG encoder config (subset; defaults mirror dual_eeg_transformer.yaml)
    eeg_in_channels: int = 32
    eeg_d_model: int = 256
    eeg_num_layers: int = 6
    eeg_num_heads: int = 8
    eeg_d_ff: int = 1024
    eeg_max_len: int = 256
    sampling_rate: float = 256.0
    use_spectrogram: bool = True
    use_ibs: bool = True
    use_robust_ibs: bool = True
    use_cross_attention: bool = True
    # ViT config (small defaults overridable for tests)
    vit_embed_dim: int = 768
    vit_depth: int = 12
    vit_num_heads: int = 12
    img_size: int = 224
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, eeg1, eeg2, deterministic: bool = True):
        img_logits = EarlyFusionViT(
            num_classes=self.num_classes, img_size=self.img_size,
            fusion_mode=self.gaze_fusion_mode, embed_dim=self.vit_embed_dim,
            depth=self.vit_depth, num_heads=self.vit_num_heads,
            dropout=self.dropout, dtype=self.dtype, name="gaze_encoder",
        )(img1, img2, deterministic=deterministic)

        eeg_out = DualEEGTransformer(
            in_channels=self.eeg_in_channels, num_classes=self.num_classes,
            d_model=self.eeg_d_model, num_layers=self.eeg_num_layers,
            num_heads=self.eeg_num_heads, d_ff=self.eeg_d_ff,
            dropout=self.dropout, max_len=self.eeg_max_len,
            sampling_rate=self.sampling_rate,
            use_spectrogram=self.use_spectrogram, use_ibs=self.use_ibs,
            use_robust_ibs=self.use_robust_ibs,
            use_cross_attention=self.use_cross_attention,
            dtype=self.dtype, name="eeg_encoder",
        )(eeg1, eeg2, deterministic=deterministic)
        eeg_logits = eeg_out["logits"]

        fusion = FuzzyGatingFusion(
            num_classes=self.num_classes, mode=self.fuzzy_mode, name="fusion"
        )
        fused_logits, alpha, aux = fusion(img_logits, eeg_logits)
        temp_reg = fusion.temperature_regularization()

        return {
            "logits": fused_logits,
            "img_logits": img_logits,
            "eeg_logits": eeg_logits,
            "alpha": alpha,
            "aux_info": aux,
            "temp_reg": temp_reg,
        }
