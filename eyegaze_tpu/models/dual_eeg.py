"""DualEEGTransformer — the flagship EEG hyperscanning model, TPU-native.

Rebuild of ``3_Models/backbones/dual_eeg_transformer.py`` as Flax modules.
The inter-brain connectivity block (the reference's hottest code path — nested
Python 32x32 loops at :604-757) is replaced by ``eyegaze_tpu.ops.connectivity``
batched linear algebra; the STFT by a framed-rfft (ops.spectral.stft).

Token sequence (full config, C=32): [CLS | IBS x42 | Spec x32 | H x64] = 139
tokens, matching the 139x139 attention map in
``7_Analysis/matlab_scripts/analyze_attention_weights.m:4``.

Ablation flags mirror the reference exactly (:995-1021): use_ibs,
use_spectrogram, use_robust_ibs, use_cross_attention, ibs_instance_norm,
ibs_feature_type — all static config, so each ablation compiles its own
XLA program with a static token count (139/121/97/65/...).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from eyegaze_tpu.models.transformer import (
    MultiHeadAttention,
    PositionalEmbedding,
    TransformerEncoder,
)
from eyegaze_tpu.ops.connectivity import (
    connectivity_matrices,
    connectivity_scalars,
    feature_indices_for,
)
from eyegaze_tpu.ops.spectral import BAND_DEFS_4, BAND_DEFS_6, stft_log_magnitude

Dtype = jnp.dtype


def adaptive_avg_pool_2d(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d parity on (..., H, W) with static shapes.

    Bin i covers [floor(i*in/out), ceil((i+1)*in/out)) — a static Python loop
    over the (small) output grid, so XLA sees only slices and means.
    """
    h, w = x.shape[-2], x.shape[-1]

    def bins(n_in, n_out):
        return [(i * n_in // n_out, -(-(i + 1) * n_in // n_out)) for i in range(n_out)]

    rows = [
        jnp.mean(x[..., r0:r1, :], axis=-2, keepdims=True) for (r0, r1) in bins(h, out_h)
    ]
    x = jnp.concatenate(rows, axis=-2)
    cols = [
        jnp.mean(x[..., :, c0:c1], axis=-1, keepdims=True) for (c0, c1) in bins(w, out_w)
    ]
    return jnp.concatenate(cols, axis=-1)


class TemporalConvFrontend(nn.Module):
    """Strided 1-D conv embedding: (B, C, T) -> (B, T', d).

    Parity: Conv1d(k=25, s=4, pad=k//2) x num_layers, ReLU + dropout
    (dual_eeg_transformer.py:138-175).
    """

    d_model: int
    kernel_size: int = 25
    stride: int = 4
    num_layers: int = 2
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = jnp.swapaxes(x, 1, 2).astype(self.dtype)  # (B, T, C) — NWC for lax conv
        pad = self.kernel_size // 2
        for i in range(self.num_layers):
            h = nn.Conv(
                self.d_model,
                kernel_size=(self.kernel_size,),
                strides=(self.stride,),
                padding=[(pad, pad)],
                dtype=self.dtype,
                name=f"conv_{i}",
            )(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h  # (B, T', d)


class SpectrogramTokenGenerator(nn.Module):
    """One token per EEG channel from a log-magnitude STFT.

    Parity: torch.stft(n_fft=128, hop=64, hann, center) -> log|.| of first 64
    bins -> Conv(32,3x3) ReLU MaxPool2 -> Conv(64,3x3) ReLU -> AdaptiveAvgPool
    (4,4) -> MLP 1024 -> d (dual_eeg_transformer.py:40-135).
    """

    d_model: int
    n_fft: int = 128
    hop_length: int = 64
    freq_bins: int = 64
    dropout: float = 0.1
    enable_perturb: bool = False  # expose conv2 activation for Grad-CAM
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, stream: str = "spec"):
        b, c, t = x.shape
        mag = stft_log_magnitude(
            x.reshape(b * c, t).astype(jnp.float32), self.n_fft, self.hop_length, self.freq_bins
        )  # (B*C, F, T')
        h = mag[..., None].astype(self.dtype)  # NHWC
        h = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, window_shape=(2, 2), strides=(2, 2))  # floor, torch parity
        h = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if self.enable_perturb:
            # Grad-CAM target: gradient w.r.t. this zero 'perturbations'
            # variable equals the gradient w.r.t. the conv2 activation — the
            # JAX equivalent of the reference's forward/backward hook on
            # spec_conv[3] (5_Metrics/eeg_metrics.py:742-953).  Named per
            # stream because the module is shared (Siamese).
            h = self.perturb(f"{stream}_conv2", h)
            self.sow("intermediates", f"{stream}_conv2_act", h)
        h = nn.relu(h)
        h = jnp.moveaxis(h, -1, 1)  # (N, 64, H, W)
        h = adaptive_avg_pool_2d(h, 4, 4)
        h = h.reshape(b * c, -1)  # (B*C, 1024)
        h = nn.Dense(self.d_model * 2, dtype=self.dtype, name="proj1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="proj2")(h)
        return h.reshape(b, c, self.d_model)


class IBSTokenGenerator(nn.Module):
    """Legacy scalar IBS token: 4 bands x 7 global features -> MLP -> (B, d).

    Parity: dual_eeg_transformer.py:178-470, with the connectivity math
    vectorized in ops.connectivity_scalars.
    """

    d_model: int
    sampling_rate: float = 256.0
    use_layernorm: bool = False
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, eeg1, eeg2, deterministic: bool = True):
        feats = connectivity_scalars(eeg1, eeg2, self.sampling_rate, BAND_DEFS_4)
        h = feats.astype(self.dtype)
        h = nn.Dense(self.d_model * 2, dtype=self.dtype, name="proj1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="proj2")(h)
        if self.use_layernorm:
            h = nn.LayerNorm(name="norm")(h)
        return h


class RobustIBSTokenizer(nn.Module):
    """Connectivity matrices -> token sequence (dual_eeg_transformer.py:822-911).

    (B, nb, nf, C, C) -> flatten to (B, nb*nf, C*C) -> optional InstanceNorm1d
    (per C*C channel, normalized across the token axis, affine) -> bottleneck
    MLP C*C -> 64 -> d -> + learned type embedding.
    """

    in_channels: int
    d_model: int
    use_instance_norm: bool = True
    num_features: int = 7
    num_bands: int = 6
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, matrices, deterministic: bool = True):
        b, nb, nf, c1, c2 = matrices.shape
        num_tokens = nb * nf
        x = matrices.reshape(b, num_tokens, c1 * c2)
        if self.use_instance_norm:
            # torch InstanceNorm1d on (B, C*C, ntok): normalize over tokens for
            # each matrix-entry channel; biased var, eps 1e-5, affine.
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-5)
            scale = self.param("in_scale", nn.initializers.ones, (c1 * c2,))
            bias = self.param("in_bias", nn.initializers.zeros, (c1 * c2,))
            x = x * scale + bias
        x = x.astype(self.dtype)
        x = nn.Dense(64, dtype=self.dtype, name="bottleneck1")(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="bottleneck2")(x)
        type_embed = self.param(
            "type_embedding", nn.initializers.normal(stddev=0.02), (num_tokens, self.d_model)
        )
        return x + type_embed[None].astype(self.dtype)


class SymmetricFusion(nn.Module):
    """Permutation-invariant fusion: Linear([z1+z2, z1*z2, |z1-z2|]) (:914-941)."""

    d_model: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z1, z2):
        combined = jnp.concatenate([z1 + z2, z1 * z2, jnp.abs(z1 - z2)], axis=-1)
        return nn.Dense(self.d_model, dtype=self.dtype, name="proj")(combined)


class CrossBrainAttention(nn.Module):
    """Bidirectional cross-attention with SHARED weights and LayerNorm (:944-974)."""

    d_model: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z1, z2, deterministic: bool = True, capture_weights: bool = False):
        mha = MultiHeadAttention(self.d_model, self.num_heads, self.dropout,
                                 dtype=self.dtype, name="cross_attn")
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        drop = nn.Dropout(self.dropout)
        if capture_weights:
            z1_cross, w1 = mha(z1, z2, z2, deterministic=deterministic, return_weights=True)
            z2_cross, w2 = mha(z2, z1, z1, deterministic=deterministic, return_weights=True)
            self.sow("intermediates", "attn_weights_1to2", w1)
            self.sow("intermediates", "attn_weights_2to1", w2)
        else:
            z1_cross = mha(z1, z2, z2, deterministic=deterministic)
            z2_cross = mha(z2, z1, z1, deterministic=deterministic)
        z1_out = norm(z1 + drop(z1_cross, deterministic=deterministic))
        z2_out = norm(z2 + drop(z2_cross, deterministic=deterministic))
        return z1_out, z2_out


class DualEEGTransformer(nn.Module):
    """Dual-stream (Siamese) EEG transformer with inter-brain synchrony tokens.

    Forward parity with dual_eeg_transformer.py:1110-1253, returning a dict
    {'logits', 'cls1', 'cls2'[, 'ibs_logits', 'ibs_token']}.  Introspection
    (connectivity matrices, cross-attention maps) is exposed through Flax
    ``sow`` intermediates instead of torch forward hooks.
    """

    in_channels: int = 32
    num_classes: int = 3
    d_model: int = 256
    num_layers: int = 6
    num_heads: int = 8
    d_ff: int = 1024
    dropout: float = 0.1
    max_len: int = 256
    conv_kernel_size: int = 25
    conv_stride: int = 4
    conv_layers: int = 2
    sampling_rate: float = 256.0
    # Spectrogram
    use_spectrogram: bool = True
    spec_n_fft: int = 128
    spec_hop_length: int = 64
    spec_freq_bins: int = 64
    # IBS
    use_robust_ibs: bool = True
    # Ablation flags
    use_ibs: bool = True
    use_cross_attention: bool = True
    ibs_instance_norm: bool = True
    ibs_feature_type: str = "all"
    # Analysis-time knobs (static; each value compiles its own program):
    mask_band: int = -1  # zero this band index in the IBS matrices
    # (frequency-sensitivity analysis; replaces FrequencyMaskHook,
    # 5_Metrics/eeg_metrics.py:318-349)
    enable_perturb: bool = False  # Grad-CAM perturbation points
    dtype: Dtype = jnp.float32

    @property
    def num_ibs_features(self) -> int:
        return len(feature_indices_for(self.ibs_feature_type))

    @property
    def num_ibs_tokens(self) -> int:
        if not self.use_ibs:
            return 0
        return 6 * self.num_ibs_features if self.use_robust_ibs else 1

    @nn.compact
    def __call__(
        self,
        eeg1: jnp.ndarray,
        eeg2: jnp.ndarray,
        deterministic: bool = True,
        capture: bool = False,
    ) -> dict:
        b = eeg1.shape[0]
        frontend = TemporalConvFrontend(
            self.d_model, self.conv_kernel_size, self.conv_stride, self.conv_layers,
            self.dropout, dtype=self.dtype, name="temporal_conv",
        )
        h1 = frontend(eeg1, deterministic)  # (B, T', d) — shared (Siamese) weights
        h2 = frontend(eeg2, deterministic)

        ibs_tokens = None
        if self.use_ibs:
            if self.use_robust_ibs:
                matrices = connectivity_matrices(
                    eeg1, eeg2, self.sampling_rate, BAND_DEFS_6,
                    feature_type=self.ibs_feature_type,
                )
                if self.mask_band >= 0:
                    matrices = matrices.at[:, self.mask_band].set(0.0)
                if capture:
                    self.sow("intermediates", "ibs_matrices", matrices)
                ibs_tokens = RobustIBSTokenizer(
                    self.in_channels, self.d_model,
                    use_instance_norm=self.ibs_instance_norm,
                    num_features=self.num_ibs_features,
                    dropout=self.dropout, dtype=self.dtype, name="ibs_tokenizer",
                )(matrices, deterministic)
            else:
                tok = IBSTokenGenerator(
                    self.d_model, self.sampling_rate, dropout=self.dropout,
                    dtype=self.dtype, name="ibs_generator",
                )(eeg1, eeg2, deterministic)
                ibs_tokens = tok[:, None, :]

        spec1 = spec2 = None
        if self.use_spectrogram:
            specgen = SpectrogramTokenGenerator(
                self.d_model, self.spec_n_fft, self.spec_hop_length,
                self.spec_freq_bins, self.dropout,
                enable_perturb=self.enable_perturb, dtype=self.dtype,
                name="spectrogram_generator",
            )
            spec1 = specgen(eeg1, deterministic, stream="spec1")
            spec2 = specgen(eeg2, deterministic, stream="spec2")

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.d_model)
        )
        cls = jnp.broadcast_to(cls_token, (b, 1, self.d_model)).astype(self.dtype)

        seq1 = [cls]
        seq2 = [cls]
        if ibs_tokens is not None:
            seq1.append(ibs_tokens)
            seq2.append(ibs_tokens)
        if spec1 is not None:
            seq1.append(spec1)
            seq2.append(spec2)
        seq1.append(h1)
        seq2.append(h2)
        seq1 = jnp.concatenate(seq1, axis=1)
        seq2 = jnp.concatenate(seq2, axis=1)

        pos = PositionalEmbedding(self.max_len, self.d_model, mode="learned",
                                  dtype=self.dtype, name="pos_embed")
        seq1 = pos(seq1)
        seq2 = pos(seq2)

        encoder = TransformerEncoder(
            self.d_model, self.num_layers, self.num_heads, self.d_ff,
            self.dropout, self.dropout, dtype=self.dtype, name="encoder",
        )
        z1 = encoder(seq1, deterministic=deterministic)
        z2 = encoder(seq2, deterministic=deterministic)

        if self.use_cross_attention:
            z1, z2 = CrossBrainAttention(
                self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
                name="cross_attn",
            )(z1, z2, deterministic=deterministic, capture_weights=capture)

        cls1 = z1[:, 0, :]
        cls2 = z2[:, 0, :]

        offset = 1 + self.num_ibs_tokens + (self.in_channels if self.use_spectrogram else 0)
        mp1 = jnp.mean(z1[:, offset:, :], axis=1)
        mp2 = jnp.mean(z2[:, offset:, :], axis=1)

        f_pair = SymmetricFusion(self.d_model, dtype=self.dtype, name="symmetric_fusion")(
            cls1, cls2
        )
        z_fuse = jnp.concatenate([f_pair, mp1, mp2], axis=-1)

        h = nn.Dense(self.d_model, dtype=self.dtype, name="classifier_1")(z_fuse)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier_2")(h)

        out = {
            "logits": logits.astype(jnp.float32),
            "cls1": cls1.astype(jnp.float32),
            "cls2": cls2.astype(jnp.float32),
            "z_fuse": z_fuse.astype(jnp.float32),
        }

        if self.use_ibs:
            if self.use_robust_ibs:
                ibs_from_seq = z1[:, 1 : 1 + self.num_ibs_tokens, :]
                ibs_pooled = jnp.mean(ibs_from_seq, axis=1)
            else:
                ibs_pooled = z1[:, 1, :]
            g = nn.Dense(self.d_model // 2, dtype=self.dtype, name="ibs_classifier_1")(ibs_pooled)
            g = nn.relu(g)
            g = nn.Dropout(0.3)(g, deterministic=deterministic)
            ibs_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="ibs_classifier_2")(g)
            out["ibs_logits"] = ibs_logits.astype(jnp.float32)
            out["ibs_token"] = ibs_pooled.astype(jnp.float32)

        return out
