"""Model zoo registry.

Mirrors the reference's pluggable per-paper model packages under
``src/models/`` (mgfn implemented, rtfm a registered placeholder —
reference: src/models/__init__.py:1, src/models/rtfm/__init__.py). New
models register a (config_cls, model_cls) pair here and become selectable
from YAML via ``runner=<name>`` (see configs/runner/).
"""

from .i3d import I3DResNet, build_i3d_feature_extractor, i3d_8x8_r50, i3res50
from .mgfn import MGFNConfig, MGFNForVideoAnomalyDetection, MGFNModel, MGFNOutput
from .rtfm import RTFMConfig, RTFMForVideoAnomalyDetection, RTFMOutput
from .sultani import SultaniConfig, SultaniForVideoAnomalyDetection, SultaniOutput

MODEL_REGISTRY = {
    "mgfn": (MGFNConfig, MGFNForVideoAnomalyDetection),
    # the reference reserved this slot but left it empty
    # (src/models/rtfm/__init__.py); implemented here
    "rtfm": (RTFMConfig, RTFMForVideoAnomalyDetection),
    # the CVPR 2018 MIL-ranking baseline the registry pattern anticipates
    "sultani": (SultaniConfig, SultaniForVideoAnomalyDetection),
}


def build_model(name: str, **config_overrides):
    """Build (config, model) from the registry with config overrides."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    config_cls, model_cls = MODEL_REGISTRY[name]
    config = config_cls(**config_overrides)
    return config, model_cls(config)


__all__ = [
    "RTFMConfig",
    "RTFMForVideoAnomalyDetection",
    "RTFMOutput",
    "SultaniConfig",
    "SultaniForVideoAnomalyDetection",
    "SultaniOutput",
    "I3DResNet",
    "build_i3d_feature_extractor",
    "i3d_8x8_r50",
    "i3res50",
    "MGFNConfig",
    "MGFNForVideoAnomalyDetection",
    "MGFNModel",
    "MGFNOutput",
    "MODEL_REGISTRY",
    "build_model",
]
