from .config import MGFNConfig
from .model import (
    MGFNForVideoAnomalyDetection,
    MGFNModel,
    MGFNOutput,
)

__all__ = [
    "MGFNConfig",
    "MGFNForVideoAnomalyDetection",
    "MGFNModel",
    "MGFNOutput",
]
