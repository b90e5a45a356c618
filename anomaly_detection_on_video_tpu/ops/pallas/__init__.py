from .crop_norm import ten_crop_standardize_pallas

__all__ = ["ten_crop_standardize_pallas"]
