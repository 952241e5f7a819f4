"""Optimizers and LR schedules (optax).

Parity targets:
- AdamW + CosineAnnealingLR per epoch (train_art.py:401-409);
- step-wise linear warmup + cosine LambdaLR (train_gaze_earlyfusion.py:93-118);
- per-group learning rates via optax.multi_transform — the multimodal trainer
  uses encoder lr 1e-5 / fusion lr 1e-4 (train_multimodal_fuzzy_fusion.py:722-736)
  and freezing becomes a zero-update group;
- global-norm grad clipping at 1.0 (train_art.py:219-222).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import optax


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int, min_ratio: float = 0.0
) -> optax.Schedule:
    """Linear warmup then cosine decay to min_ratio*base_lr, stepped per batch
    (train_gaze_earlyfusion.py:93-118 semantics)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=base_lr * min_ratio,
    )


def cosine_annealing_schedule(base_lr: float, total_epochs: int, steps_per_epoch: int) -> optax.Schedule:
    """torch CosineAnnealingLR(T_max=epochs) stepped per epoch: the LR is a
    function of the epoch index, constant within an epoch."""
    import math

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // max(steps_per_epoch, 1)
        frac = jnp.minimum(epoch / max(total_epochs, 1), 1.0)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.01,
    grad_clip: Optional[float] = 1.0,
    param_groups: Optional[Callable] = None,
    group_lrs: Optional[Dict[str, float]] = None,
    frozen_groups: Sequence[str] = (),
) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping and per-group LR / freezing.

    ``param_groups(path, value) -> group_name`` assigns each parameter to a
    group; ``group_lrs`` maps group names to learning rates (groups absent
    from it use ``learning_rate``); groups in ``frozen_groups`` get zero
    updates (idiomatic JAX encoder freezing).
    """
    def adamw(lr):
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)

    if param_groups is None:
        tx = adamw(learning_rate)
    else:
        group_lrs = group_lrs or {}
        names = set(group_lrs) | set(frozen_groups) | {"default"}
        transforms = {}
        for g in names:
            if g in frozen_groups:
                transforms[g] = optax.set_to_zero()
            else:
                transforms[g] = adamw(group_lrs.get(g, learning_rate))

        def labeler(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, v: (
                    param_groups(tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path), v)
                ),
                params,
            )

        tx = optax.multi_transform(transforms, labeler)

    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
