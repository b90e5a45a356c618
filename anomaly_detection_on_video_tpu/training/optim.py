"""Optimizer construction (reference: src/runner.py:53-59).

The reference uses torch.optim.Adam(lr=1e-3, weight_decay=5e-4) — coupled L2
weight decay folded into the gradient *before* the Adam moments (not AdamW).
``optax.add_decayed_weights`` before ``optax.adam`` reproduces exactly that
update; defaults (betas 0.9/0.999, eps 1e-8) match torch.
"""

from __future__ import annotations

import optax


def adam_with_l2(
    learning_rate: float = 1e-3,
    weight_decay: float = 5e-4,
    grad_clip: float | None = None,
):
    """``grad_clip`` clips raw gradients to this global norm BEFORE the L2
    term and the Adam moments — the semantics of the reference trainer's
    ``gradient_clip_val`` knob (configs/trainer/default.yaml:4, Lightning's
    default clip-by-norm algorithm, which clips what the loss produced,
    while torch Adam folds its coupled weight decay in afterwards).

    The chain always has the same three slots (disabled ones are
    ``optax.identity()``, whose state is the same ``EmptyState``), so the
    checkpointed ``opt_state`` tree is IDENTICAL for every knob setting —
    a checkpoint trained with gradient clipping restores into an eval-only
    or resume template built without it, and vice versa."""
    return optax.chain(
        optax.clip_by_global_norm(float(grad_clip))
        if grad_clip
        else optax.identity(),
        optax.add_decayed_weights(weight_decay)
        if weight_decay
        else optax.identity(),
        optax.adam(learning_rate),
    )


def build_optimizer(name: str = "adam", **kwargs):
    builders = {"adam": adam_with_l2, "adamw": optax.adamw, "sgd": optax.sgd}
    if name not in builders:
        raise KeyError(f"unknown optimizer {name!r}; options: {sorted(builders)}")
    return builders[name](**kwargs)
