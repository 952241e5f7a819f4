"""eyegaze_tpu — TPU-native (JAX/XLA/Pallas/pjit) hyperscanning framework.

A from-scratch rebuild of the capabilities of ``roseDwayane/EyeGaze-Multimodal``
(social-interaction classification from paired eye-gaze heatmaps + paired
32-channel EEG, plus an EEG artifact-removal seq2seq model), designed
TPU-first:

- signal preprocessing + inter-brain connectivity as fused, vmapped XLA/Pallas
  kernels (``eyegaze_tpu.ops``) instead of per-trial NumPy/SciPy loops,
- the model zoo (Early/Late-fusion ViT, DualEEGTransformer, FuzzyGatingFusion,
  ART) as jit-compiled Flax modules (``eyegaze_tpu.models``),
- bf16 jit training with optax + orbax checkpoints (``eyegaze_tpu.train``),
- scale-out via ``jax.sharding.Mesh`` data parallelism (``eyegaze_tpu.parallel``).

Layer map mirrors the reference repo's numbered layers; see SURVEY.md.
"""

__version__ = "0.1.0"
