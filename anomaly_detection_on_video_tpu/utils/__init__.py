from .convert import (
    convert_i3res50_state_dict,
    convert_mgfn_state_dict,
    convert_official_mgfn_state_dict,
)

__all__ = [
    "convert_i3res50_state_dict",
    "convert_mgfn_state_dict",
    "convert_official_mgfn_state_dict",
]

from .convert import convert_pytorchvideo_resnet_state_dict  # noqa: E402

__all__.append("convert_pytorchvideo_resnet_state_dict")

from .model_size import model_size_bits, print_model_size  # noqa: E402

__all__ += ["model_size_bits", "print_model_size"]
