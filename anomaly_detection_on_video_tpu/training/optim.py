"""Optimizer construction (reference: src/runner.py:53-59).

The reference uses torch.optim.Adam(lr=1e-3, weight_decay=5e-4) — coupled L2
weight decay folded into the gradient *before* the Adam moments (not AdamW).
``optax.add_decayed_weights`` before ``optax.adam`` reproduces exactly that
update; defaults (betas 0.9/0.999, eps 1e-8) match torch.
"""

from __future__ import annotations

import optax


def adam_with_l2(learning_rate: float = 1e-3, weight_decay: float = 5e-4):
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate),
        )
    return optax.adam(learning_rate)


def build_optimizer(name: str = "adam", **kwargs):
    builders = {"adam": adam_with_l2, "adamw": optax.adamw, "sgd": optax.sgd}
    if name not in builders:
        raise KeyError(f"unknown optimizer {name!r}; options: {sorted(builders)}")
    return builders[name](**kwargs)
