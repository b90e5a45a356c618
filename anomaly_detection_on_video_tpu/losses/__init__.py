from .base import contrastive_loss, smoothness_loss, sparsity_loss
from .mgfn import mgfn_loss

__all__ = [
    "contrastive_loss",
    "smoothness_loss",
    "sparsity_loss",
    "mgfn_loss",
]
