"""Sultani MIL hyperparameters (Sultani et al., CVPR 2018).

The reference's ``src/models/`` package is an extensible per-paper model
registry (reference: src/models/__init__.py:1); alongside MGFN and RTFM
this adds the field's canonical baseline — the deep MIL ranking model of
"Real-world Anomaly Detection in Surveillance Videos". Defaults follow the
official release (waqassultani/AnomalyDetectionCVPR2018): FC 512 -> 32 -> 1
with dropout 0.6, ranking-loss lambdas 8e-5, L2 weight decay 1e-3 (set in
configs/runner/sultani.yaml). The paper's C3D fc6 features are 4096-d;
this framework's extraction plane produces 2048-d I3D features, so
``channels`` defaults to 2048 (the published I3D re-runs of this model use
the same substitution).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SultaniConfig:
    channels: int = 2048
    hidden_dims: Tuple[int, int] = (512, 32)
    dropout_rate: float = 0.6
    smoothness_lambda: float = 8e-5
    sparsity_lambda: float = 8e-5
