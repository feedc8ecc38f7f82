from . import nn, patch, tiles, resize, ssim, gradient  # noqa: F401
