"""Cross-framework training-recipe equivalence band (VERDICT r3 item #3).

``scripts/train_equivalence.py`` trains the reference torch
DualEEGTransformer and the Flax model from IDENTICAL initial weights
(state_dict ported), on byte-identical data/split/batch order, under the
reference recipe (AdamW + per-epoch cosine + clip 1.0, CE + 0.5*IBS-cls +
0.3*IBS-contrastive, dropout 0) — so the val macro-F1 trajectories must
agree up to framework numerics.

Two layers of protection:
- the fast test pins the band on the committed artifact
  (measurements/train_equivalence_r4.json) so a regressed artifact can
  never be silently re-committed;
- the slow test re-derives the artifact from scratch at the same config
  (both trainings, ~10 min on the 1-core host) and pins the same band.
"""

import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parent.parent / "measurements" / \
    "train_equivalence_r4.json"

# The band: both frameworks must end within 0.1 macro-F1 of each other AND
# both must have learned the synthetic coupling (>= 0.9).  Mid-training
# trajectories may transiently diverge (optimization is chaotic; the r4
# artifact's max per-epoch gap is 0.39 at epoch 2) — the equivalence claim
# is about where the recipes LAND, not bitwise step parity.
F1_GAP_FINAL_MAX = 0.1
F1_FINAL_MIN = 0.9


def _assert_band(res):
    assert res["f1_gap_final"] <= F1_GAP_FINAL_MAX, res["f1_gap_final"]
    assert res["torch"]["val_f1"][-1] >= F1_FINAL_MIN
    assert res["flax"]["val_f1"][-1] >= F1_FINAL_MIN
    # Both loss curves must be monotone-ish decreasing (first -> last drop
    # of at least 40%): the recipes optimize, not just the final eval.
    for side in ("torch", "flax"):
        losses = res[side]["train_loss"]
        assert losses[-1] < 0.6 * losses[0], (side, losses)


def test_committed_equivalence_artifact_band():
    if not ARTIFACT.exists():
        pytest.skip("equivalence artifact not generated yet")
    res = json.loads(ARTIFACT.read_text())
    _assert_band(res)
    # The artifact must be self-describing enough to re-derive.
    cfg = res["config"]
    assert cfg["init"] == "torch state_dict ported to flax"
    assert cfg["dropout"] == 0.0
    assert "ibs_contrastive" in cfg["objective"]


GAZE_ARTIFACT = Path(__file__).resolve().parent.parent / "measurements" / \
    "train_equivalence_gaze_r5.json"


def test_committed_gaze_equivalence_artifact_band():
    """Round-5 extension (VERDICT r4 Weak #7): the gaze-ViT recipe —
    AdamW + per-BATCH warmup-cosine + weighted CE + clip
    (train_gaze_earlyfusion.py:93-118,406-445) — trained torch-vs-flax on
    byte-identical data/init must land inside the same band."""
    if not GAZE_ARTIFACT.exists():
        pytest.skip("gaze equivalence artifact not generated yet")
    res = json.loads(GAZE_ARTIFACT.read_text())
    _assert_band(res)
    cfg = res["config"]
    assert res["family"] == "gaze"
    assert "weighted CE" in cfg["objective"]
    assert "warmup-cosine" in cfg["optimizer"]
    assert cfg["dropout"] == 0.0


MM_ARTIFACT = Path(__file__).resolve().parent.parent / "measurements" / \
    "train_equivalence_multimodal_r5.json"


def test_committed_multimodal_equivalence_artifact_band():
    """Round-5 completion of the reference's trainer trio: the multimodal
    fuzzy recipe (train_multimodal_fuzzy_fusion.py:420-460,724-745 —
    3-param-group AdamW, per-batch warmup-cosine, CE(fused) +
    temperature-calibrated aux CEs + temp-reg, clip) trained torch-vs-flax
    on byte-identical data/init.  The image modality saturates val F1 at 1.0
    immediately (easy by construction), so the discriminating evidence is
    the LOSS trajectory: both curves must decay >40% and agree closely."""
    if not MM_ARTIFACT.exists():
        pytest.skip("multimodal equivalence artifact not generated yet")
    res = json.loads(MM_ARTIFACT.read_text())
    _assert_band(res)
    assert res["family"] == "multimodal"
    cfg = res["config"]
    assert "temp_reg" in cfg["objective"] and "T detached" in cfg["objective"]
    assert "3 param groups" in cfg["optimizer"]
    # Loss-trajectory agreement: per-epoch gap under 0.05 on a curve that
    # spans ~1.5 -> ~0.37 (committed artifact: max gap 0.036).
    for a, b in zip(res["torch"]["train_loss"], res["flax"]["train_loss"]):
        assert abs(a - b) < 0.05, (a, b)


@pytest.mark.slow
def test_rederive_equivalence_from_scratch():
    """Re-run both trainings at the committed artifact's exact config and
    pin the same band (the artifact is reproducible, not an heirloom)."""
    pytest.importorskip("torch")
    if not Path("/root/reference/3_Models/backbones").exists():
        pytest.skip("reference checkout not mounted")

    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        from train_equivalence import run
    finally:
        sys.path.pop(0)
    res = run(log=lambda s: None)
    _assert_band(res)
