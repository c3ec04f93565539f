"""Dataset/labeling toolchain: label validation, splits, CSV utilities."""
