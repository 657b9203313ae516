from sift_tpu.ops.color import to_grayscale
from sift_tpu.ops.resize import downsample_nearest_x2, upsample_bilinear
from sift_tpu.ops.blur import gaussian_blur, separable_blur

__all__ = [
    "to_grayscale",
    "downsample_nearest_x2",
    "upsample_bilinear",
    "gaussian_blur",
    "separable_blur",
]
