from .gtransforms import (
    loop_pad_indices,
    preprocess_frames,
    standardize,
    ten_crop,
    ten_crop_positions,
)
from .resize import pil_resize_coeffs, resize_bilinear_exact, short_side_size

__all__ = [
    "loop_pad_indices",
    "preprocess_frames",
    "standardize",
    "ten_crop",
    "ten_crop_positions",
    "pil_resize_coeffs",
    "resize_bilinear_exact",
    "short_side_size",
]
