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
- scale-out via ``jax.sharding.Mesh`` data parallelism plus Megatron-style
  tensor parallelism over a 2-D (data, model) mesh (``eyegaze_tpu.parallel``).

Layer map mirrors the reference repo's numbered layers; see SURVEY.md.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even on deployments whose site hook overrides the env
# var via the config API after interpreter start (the axon relay does this,
# CLAUDE.md "Environment").  Applying the env value back through the config
# API restores standard JAX semantics: subprocess tests that export
# JAX_PLATFORMS=cpu actually get CPU instead of silently compiling on the
# remote TPU (measured: a 4-file analyze_entropy run took 11m39s of relay
# compile wait before this, seconds after).
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception as _e:
        # Cannot take effect (backends already initialized before this
        # import, or unknown platform string).  Warn instead of silently
        # running on the deployment default — the symptom otherwise is an
        # unexplained multi-minute remote-compile wait.
        import warnings as _warnings

        _warnings.warn(
            f"JAX_PLATFORMS={_os.environ['JAX_PLATFORMS']!r} could not be "
            f"applied ({_e}); continuing on the already-initialized backend",
            RuntimeWarning,
            stacklevel=2,
        )
