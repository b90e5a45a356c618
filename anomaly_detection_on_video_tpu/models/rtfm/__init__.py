"""RTFM model package (Tian et al., ICCV 2021).

The reference repo reserved this slot but never implemented it
(reference: src/models/rtfm/__init__.py is empty); this package fills it
with a TPU-native implementation — the registry's second model family.
"""

from .config import RTFMConfig
from .model import RTFMForVideoAnomalyDetection, RTFMOutput

__all__ = ["RTFMConfig", "RTFMForVideoAnomalyDetection", "RTFMOutput"]
