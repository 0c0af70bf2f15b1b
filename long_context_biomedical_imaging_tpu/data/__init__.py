from .dataset import NumpyDataset
from .loader import BatchLoader
from .transforms import (apply_augmentations, normalize_shape,
                         sample_augmentation_params)

__all__ = ["NumpyDataset", "BatchLoader", "normalize_shape",
           "apply_augmentations", "sample_augmentation_params"]
