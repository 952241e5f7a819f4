"""Gating tests for the flash-attention dispatch in MultiHeadAttention.

The kernel itself (jax.experimental.pallas.ops.tpu.flash_attention) only
compiles on a real TPU; its output parity and speed are driven by
``scripts/bench_flash_attn.py`` on device (results in BASELINE.md).  Here we
pin the dispatch conditions so no CPU/GPU run, masked call, weight capture,
or attention-dropout training step can ever silently switch kernels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eyegaze_tpu.models.transformer import MultiHeadAttention, _flash_eligible


def test_flash_gating_static_conditions(monkeypatch):
    monkeypatch.setenv("EYEGAZE_FLASH_ATTN", "auto")
    on_tpu = jax.default_backend() == "tpu"
    # ART hot path (T=1024, d_k=16): the d_k performance gate keeps it on the
    # einsum path in auto mode — measured 2.0-2.2x SLOWER via flash on v5e
    # (measurements/flash_attn_r3.json; the kernel pads d_k 16 -> 128 lanes).
    assert not _flash_eligible(1024, 1024, 16, False, False, False)
    # Wide heads (d_k multiple of 128) at bf16 compute are auto-eligible on
    # TPU only (the default dtype argument is bf16).
    assert _flash_eligible(1024, 1024, 128, False, False, False) == on_tpu
    assert _flash_eligible(1024, 1024, 256, False, False, False) == on_tpu
    # Parity gate: f32 compute is NEVER auto-eligible — the kernel ingests
    # MXU operands at bf16 and drifts ~0.9% rel vs an f32 einsum
    # (measurements/flash_attn_r3.json), a dtype property, not a d_k one.
    assert not _flash_eligible(1024, 1024, 128, False, False, False,
                               jnp.float32)
    # EYEGAZE_FLASH_ATTN=1 overrides ONLY the perf/parity gates (d_k width
    # and bf16-compute; re-measurement hook for bench_flash_attn.py) —
    # still TPU-only.
    monkeypatch.setenv("EYEGAZE_FLASH_ATTN", "1")
    assert _flash_eligible(1024, 1024, 16, False, False, False) == on_tpu
    assert _flash_eligible(1024, 1024, 128, False, False, False,
                           jnp.float32) == on_tpu
    # ...but never the semantic gates: masked, weight-returning, or
    # attention-dropout calls keep the einsum path even when forced.
    assert not _flash_eligible(1024, 1024, 16, True, False, False)
    assert not _flash_eligible(1024, 1024, 16, False, True, False)
    assert not _flash_eligible(1024, 1024, 16, False, False, True)
    # Non-tileable wide heads stay out even when forced.
    assert not _flash_eligible(1024, 1024, 192, False, False, False)
    # ...and the sequence-tileability gate holds under force too: env='1' is
    # perf-gate-only, it must not let the kernel grid 139/197-token calls.
    assert not _flash_eligible(139, 139, 16, False, False, False)
    assert not _flash_eligible(197, 197, 128, False, False, False)
    monkeypatch.setenv("EYEGAZE_FLASH_ATTN", "auto")
    # Short sequences (EEG 139 tokens, ViT 197) are not grid-tileable.
    assert not _flash_eligible(139, 139, 32, False, False, False)
    assert not _flash_eligible(197, 197, 64, False, False, False)
    # Force-off wins everywhere.
    monkeypatch.setenv("EYEGAZE_FLASH_ATTN", "0")
    assert not _flash_eligible(1024, 1024, 128, False, False, False)


def test_mha_einsum_path_unchanged_under_flag(monkeypatch):
    """On CPU the flag must be inert: outputs identical with env 0/1/auto."""
    mha = MultiHeadAttention(d_model=64, num_heads=4)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 256, 64)), jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    outs = []
    for env in ("0", "1", "auto"):
        monkeypatch.setenv("EYEGAZE_FLASH_ATTN", env)
        outs.append(np.asarray(mha.apply(params, x, x, x)))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_einsum_path_matches_kernel_reference_layout():
    """The (B,T,H,d)->(B,H,T,d) translation handed to the flash kernel must
    agree with the einsum path: compare against the kernel module's own pure
    jnp reference (mha_reference) on CPU.  Pins the layout/sm_scale contract
    so an MHA refactor cannot silently diverge from what the kernel computes."""
    import math

    from jax.experimental.pallas.ops.tpu.flash_attention import mha_reference

    r = np.random.default_rng(3)
    b, h, t, d = 2, 8, 256, 16
    q, k, v = (jnp.asarray(r.normal(size=(b, h, t, d)), jnp.float32)
               for _ in range(3))

    qh, kh, vh = (jnp.swapaxes(a, 1, 2) for a in (q, k, v))  # (B,T,H,d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, axis=-1), vh)

    ref = mha_reference(q, k, v, None, sm_scale=1.0 / math.sqrt(d))
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(ctx, 1, 2)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_art_attn_dropout_knob_reaches_attention():
    """ArtConfig.attn_dropout=0.0 must zero ONLY the attention-weight dropout
    while other dropouts stay live; None keeps the reference behavior
    (attention dropout = model dropout).  Per docs/PARITY.md the knob no
    longer changes the dispatched kernel (ART's d_k=16 stays on einsum under
    the measured d_k gate); it remains a regularization choice and the
    re-measurement hook for EYEGAZE_FLASH_ATTN=1 runs."""
    import numpy as np

    import jax
    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer

    base = dict(in_channels=4, out_channels=4, embedding_size=32,
                num_encoder_layers=1, num_decoder_layers=1, num_heads=4,
                feedforward_size=64, max_len=64, dropout=0.5)
    m_ref = ArtifactRemovalTransformer(ArtConfig(**base))
    m_noattn = ArtifactRemovalTransformer(ArtConfig(**base, attn_dropout=0.0))
    x = np.random.default_rng(0).normal(size=(2, 4, 64)).astype(np.float32)
    params = m_ref.init(jax.random.PRNGKey(0), x, x)["params"]

    rng = {"dropout": jax.random.PRNGKey(7)}
    out_ref = m_ref.apply({"params": params}, x, x, deterministic=False,
                          rngs=rng)
    out_no = m_noattn.apply({"params": params}, x, x, deterministic=False,
                            rngs=rng)
    # Same params + same rng: any difference can come only from the
    # attention-weight dropout the knob disabled.
    assert not np.allclose(np.asarray(out_ref), np.asarray(out_no))
    # And with dropout=0 everywhere the knob is a no-op.
    m0a = ArtifactRemovalTransformer(ArtConfig(**{**base, "dropout": 0.0}))
    m0b = ArtifactRemovalTransformer(
        ArtConfig(**{**base, "dropout": 0.0}, attn_dropout=0.0))
    np.testing.assert_array_equal(
        np.asarray(m0a.apply({"params": params}, x, x, deterministic=False,
                             rngs=rng)),
        np.asarray(m0b.apply({"params": params}, x, x, deterministic=False,
                             rngs=rng)))


def test_headpack_gating(monkeypatch):
    """_headpack_eligible: semantic gates always hold; env=1 forces (TPU +
    tileability only); auto stays OFF until the on-device shootout commits
    a win (models/transformer.py docstring contract)."""
    import eyegaze_tpu.models.transformer as tr
    from eyegaze_tpu.models.transformer import _headpack_eligible

    monkeypatch.delenv("EYEGAZE_HEADPACK_ATTN", raising=False)
    # Auto is off everywhere pending the measured decision.
    monkeypatch.setattr(tr.jax, "default_backend", lambda: "tpu")
    assert not _headpack_eligible(1024, 1024, 16, False, False, False)
    monkeypatch.setenv("EYEGAZE_HEADPACK_ATTN", "1")
    assert _headpack_eligible(1024, 1024, 16, False, False, False)
    # Semantic gates survive force.
    assert not _headpack_eligible(1024, 1024, 16, True, False, False)
    assert not _headpack_eligible(1024, 1024, 16, False, True, False)
    assert not _headpack_eligible(1024, 1024, 16, False, False, True)
    # Tileability gates survive force: 139 tokens / oversized key axis.
    assert not _headpack_eligible(139, 139, 16, False, False, False)
    assert not _headpack_eligible(1024, 4096, 16, False, False, False)
    monkeypatch.setenv("EYEGAZE_HEADPACK_ATTN", "0")
    assert not _headpack_eligible(1024, 1024, 16, False, False, False)
    monkeypatch.setenv("EYEGAZE_HEADPACK_ATTN", "1")
    monkeypatch.setattr(tr.jax, "default_backend", lambda: "cpu")
    assert not _headpack_eligible(1024, 1024, 16, False, False, False)


def test_headpacked_attention_parity():
    """The head-packed kernel (interpret mode on CPU) must match the einsum
    path's exact numerics contract — f32 scores/softmax, input-dtype PV with
    f32 accumulation — forward AND grads (custom_vjp einsum backward)."""
    import math

    from eyegaze_tpu.ops.attn_kernels import headpacked_attention

    r = np.random.default_rng(5)
    b, t, h, d = 2, 256, 8, 16
    qh, kh, vh = (jnp.asarray(r.normal(size=(b, t, h, d)), jnp.float32)
                  for _ in range(3))
    scale = 1.0 / math.sqrt(d)

    def einsum_ref(qh, kh, vh):
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", a.astype(qh.dtype), vh,
                          preferred_element_type=jnp.float32).astype(qh.dtype)

    got = headpacked_attention(qh, kh, vh, scale, True)
    want = einsum_ref(qh, kh, vh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)

    # Gradients: custom_vjp backward vs jax.grad through the einsum ref.
    def loss_k(args):
        return (headpacked_attention(*args, scale, True) ** 2).sum()

    def loss_e(args):
        return (einsum_ref(*args) ** 2).sum()

    gk = jax.grad(loss_k)((qh, kh, vh))
    ge = jax.grad(loss_e)((qh, kh, vh))
    for a, b_ in zip(gk, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_qchunk_gating(monkeypatch):
    """EYEGAZE_ATTN_QCHUNK gates: divides Tq, strictly smaller, and never a
    masked / weight-dropout / weight-capture call (those keep the unchunked
    path for the same reasons as _flash_eligible).  Auto mode applies the
    measured boundary (measurements/art_batch_sweep_r4.json): chunk=128 on
    TPU self-attention with Tq >= 1024 tileable and B*H <= 128 only."""
    import eyegaze_tpu.models.transformer as tr
    from eyegaze_tpu.models.transformer import _attn_qchunk

    on_tpu = jax.default_backend() == "tpu"
    monkeypatch.delenv("EYEGAZE_ATTN_QCHUNK", raising=False)
    # Auto: ART's hot shape (B=16, H=8 -> B*H=128) chunks on TPU only.
    assert _attn_qchunk(16, 8, 1024, 1024, False, False, False) == (
        128 if on_tpu else 0)
    monkeypatch.setattr(tr.jax, "default_backend", lambda: "tpu")
    assert _attn_qchunk(16, 8, 1024, 1024, False, False, False) == 128
    # Measured LOSS region: B*H = 256 stays unchunked in auto mode.
    assert _attn_qchunk(32, 8, 1024, 1024, False, False, False) == 0
    # Cross-attention (tq != tk), short, and non-tileable stay unchunked.
    assert _attn_qchunk(16, 8, 1024, 512, False, False, False) == 0
    assert _attn_qchunk(16, 8, 512, 512, False, False, False) == 0
    assert _attn_qchunk(16, 8, 1088, 1088, False, False, False) == 0
    monkeypatch.setattr(tr.jax, "default_backend", lambda: "cpu")
    assert _attn_qchunk(16, 8, 1024, 1024, False, False, False) == 0
    monkeypatch.undo()
    monkeypatch.setenv("EYEGAZE_ATTN_QCHUNK", "128")
    assert _attn_qchunk(16, 8, 1024, 1024, False, False, False) == 128
    assert _attn_qchunk(16, 8, 139, 139, False, False, False) == 0  # 128 !| 139
    assert _attn_qchunk(16, 8, 128, 128, False, False, False) == 0  # not < Tq
    assert _attn_qchunk(16, 8, 1024, 1024, True, False, False) == 0  # masked
    assert _attn_qchunk(16, 8, 1024, 1024, False, True, False) == 0  # weight dropout
    assert _attn_qchunk(16, 8, 1024, 1024, False, False, True) == 0  # weight capture
    monkeypatch.setenv("EYEGAZE_ATTN_QCHUNK", "garbage")
    assert _attn_qchunk(16, 8, 1024, 1024, False, False, False) == 0
    monkeypatch.setenv("EYEGAZE_ATTN_QCHUNK", "-64")
    assert _attn_qchunk(16, 8, 1024, 1024, False, False, False) == 0
    # Explicit 0 forces off even in the auto win region.
    monkeypatch.setenv("EYEGAZE_ATTN_QCHUNK", "0")
    monkeypatch.setattr(tr.jax, "default_backend", lambda: "tpu")
    assert _attn_qchunk(16, 8, 1024, 1024, False, False, False) == 0


def test_qchunk_attention_parity(monkeypatch):
    """The q-chunked scan path must match the full einsum path — forward AND
    gradients — since chunking is over queries only (every softmax row still
    sees the full key axis)."""
    mha = MultiHeadAttention(d_model=64, num_heads=4, dtype=jnp.float32)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 256, 64)), jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)

    def loss(p, x):
        return (mha.apply(p, x, x, x) ** 2).sum()

    monkeypatch.delenv("EYEGAZE_ATTN_QCHUNK", raising=False)
    monkeypatch.setenv("EYEGAZE_FLASH_ATTN", "0")
    y_full = mha.apply(params, x, x, x)
    g_full = jax.grad(loss)(params, x)
    monkeypatch.setenv("EYEGAZE_ATTN_QCHUNK", "64")
    y_chunk = mha.apply(params, x, x, x)
    g_chunk = jax.grad(loss)(params, x)

    np.testing.assert_allclose(np.asarray(y_chunk), np.asarray(y_full),
                               rtol=0, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5),
        g_full, g_chunk)

    # Masked calls must silently fall back to the unchunked path (identical
    # result), not error or diverge.
    mask = jnp.ones((2, 1, 256, 256), jnp.int32).at[:, :, :, 200:].set(0)
    y_m_chunk = mha.apply(params, x, x, x, attn_mask=mask)
    monkeypatch.delenv("EYEGAZE_ATTN_QCHUNK")
    y_m_full = mha.apply(params, x, x, x, attn_mask=mask)
    np.testing.assert_allclose(np.asarray(y_m_chunk), np.asarray(y_m_full),
                               rtol=0, atol=0)
