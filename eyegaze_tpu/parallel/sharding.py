"""Tensor-parallel (Megatron-style) parameter sharding over a 2-D mesh.

The reference is single-GPU (SURVEY.md §5.8), so every multi-device axis here
is beyond-parity design headroom.  Pure DP (``parallel/mesh.py``) replicates
parameters; for the ViT-B family (86M params -> ~1 GB of f32 AdamW state) a
second *model* axis shards the per-layer matmuls Megatron-style so the same
training step also runs tensor-parallel — activations flow

  x (B/dp, T, E)  --[col-sharded W_qkv / fc1]-->  per-head / hidden shards
                  --[row-sharded W_out / fc2]-->  partial sums, one
                                                  all-reduce per block

with every collective inserted by XLA's GSPMD partitioner from the parameter
shardings below — no explicit psum/collective code, exactly like the DP path.

Rules cover both attention/MLP namings used in this repo:
- the ViT backbone (``models/vit.py``): Flax ``MultiHeadDotProductAttention``
  params ``attn/{query,key,value}`` with kernels (E, H, Dh) and ``attn/out``
  (H, Dh, E), MLP ``mlp/fc1|fc2``;
- the shared stack (``models/transformer.py``, used by DualEEG/ART):
  ``{q,k,v,out}_proj`` Dense kernels (E, E) and ``ffn/linear1|linear2``.

A rule only applies when the sharded dimension divides the model-axis size;
otherwise the leaf falls back to replicated (correct, just not sharded) —
e.g. the EEG flagship's non-transformer parts (connectivity, CNN frontend)
and any head whose width is not a multiple of the axis.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# (path regex, PartitionSpec) — first match wins; matched against the
# '/'-joined leaf path (which, inside optimizer state, ends with the same
# param path, so Adam's mu/nu shard identically to their parameters).
TP_RULES: Tuple[Tuple[str, P], ...] = (
    # ViT attention (Flax MultiHeadDotProductAttention): shard the head axis.
    (r"attn/(query|key|value)/kernel$", P(None, MODEL_AXIS, None)),
    (r"attn/(query|key|value)/bias$", P(MODEL_AXIS, None)),
    (r"attn/out/kernel$", P(MODEL_AXIS, None, None)),
    # ViT MLP: column-parallel fc1, row-parallel fc2.
    (r"mlp/fc1/kernel$", P(None, MODEL_AXIS)),
    (r"mlp/fc1/bias$", P(MODEL_AXIS)),
    (r"mlp/fc2/kernel$", P(MODEL_AXIS, None)),
    # Shared stack MHA (packed-head Dense projections).
    (r"(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r"(q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r"out_proj/kernel$", P(MODEL_AXIS, None)),
    # Shared stack FFN.
    (r"ffn/linear1/kernel$", P(None, MODEL_AXIS)),
    (r"ffn/linear1/bias$", P(MODEL_AXIS)),
    (r"ffn/linear2/kernel$", P(MODEL_AXIS, None)),
)


def parse_mesh_spec(spec: Any, n_devices: Optional[int] = None) -> Tuple[int, int]:
    """Parse a mesh spec into (dp, tp) sizes.

    Accepts ``True``/``"dp"`` (all devices data-parallel), ``"tp4"`` (pure
    tensor parallel), ``"dp2,tp4"`` (explicit 2-D), or ``"dp4"``.  An
    unsized ``dp`` absorbs the devices the other axis leaves free.
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    if spec is True or spec is None or spec == "":
        return n_devices, 1
    if not isinstance(spec, str):
        raise ValueError(f"mesh spec must be a string or True, got {spec!r}")
    dp: Optional[int] = None
    tp = 1
    for token in spec.split(","):
        token = token.strip().lower()
        if not token:
            continue
        m = re.fullmatch(r"(dp|tp)(\d*)", token)
        if not m:
            raise ValueError(f"bad mesh token {token!r} (want dp[N] / tp[N])")
        size = int(m.group(2)) if m.group(2) else None
        if m.group(1) == "dp":
            dp = size  # None = fill
        else:
            if size is None:
                raise ValueError("tp needs an explicit size, e.g. tp2")
            tp = size
    if dp is None:
        dp = max(n_devices // tp, 1)
    if dp * tp > n_devices:
        raise ValueError(
            f"mesh spec {spec!r} needs {dp * tp} devices, have {n_devices}")
    return dp, tp


def make_mesh_2d(dp: int, tp: int) -> Mesh:
    """(dp, tp) mesh with axes ("data", "model").

    The model axis is the FAST (innermost) axis so that, on a real slice,
    tensor-parallel collectives (one all-reduce per block, every layer) ride
    neighbouring ICI links while the once-per-step DP gradient all-reduce
    spans the slower outer axis.
    """
    devices = np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def partition_spec_for(path_s: str, shape: Sequence[int], mesh: Mesh,
                       rules: Sequence[Tuple[str, P]] = TP_RULES) -> P:
    """First matching rule whose sharded dims divide the mesh axis; else P()."""
    for pattern, spec in rules:
        if re.search(pattern, path_s):
            if len(spec) > len(shape):
                return P()
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                if shape[dim] % mesh.shape[axis] != 0:
                    return P()
            return spec
    return P()


def shard_tp(tree: Any, mesh: Mesh,
             rules: Sequence[Tuple[str, P]] = TP_RULES) -> Any:
    """device_put a pytree (params or a full TrainState) with TP shardings.

    Leaves matching no rule (or with non-divisible dims) are replicated, so
    the result is always a valid GSPMD input: optimizer scalars, layer norms,
    embeddings, and non-transformer submodules stay replicated while the
    transformer matmul weights (and their Adam moments, whose paths end with
    the same param path) shard over the model axis.
    """

    def place(path, leaf):
        spec = (P() if np.ndim(leaf) == 0
                else partition_spec_for(_path_str(path), np.shape(leaf), mesh, rules))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
