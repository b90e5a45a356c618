"""Sultani MIL model package (Sultani et al., CVPR 2018).

Third model family in the registry the reference's ``src/models/`` package
establishes (reference: src/models/__init__.py:1): the canonical deep MIL
ranking baseline for video anomaly detection, TPU-native.
"""

from .config import SultaniConfig
from .model import SultaniForVideoAnomalyDetection, SultaniOutput

__all__ = [
    "SultaniConfig",
    "SultaniForVideoAnomalyDetection",
    "SultaniOutput",
]
