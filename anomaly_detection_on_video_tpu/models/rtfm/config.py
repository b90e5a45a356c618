"""RTFM hyperparameters (Tian et al., ICCV 2021).

The reference repo reserved an empty slot for RTFM
(reference: src/models/rtfm/__init__.py); this fills it. Defaults follow
the paper / official release: 2048-d I3D features, top-k=3 magnitude
selection, margin 100 feature-magnitude separation, dropout 0.7.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RTFMConfig:
    channels: int = 2048
    hidden_dims: Tuple[int, int] = (512, 128)
    dropout_rate: float = 0.7
    k: int = 3
    margin: float = 100.0
    alpha: float = 0.0001
    smoothness_lambda: float = 8e-4
    sparsity_lambda: float = 8e-3
