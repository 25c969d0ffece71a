from .scatter import scatter_any, scatter_last_wins
from .image import (
    bilinear_resize, bilinear_sample, box_filter, conv2d_same,
    correlate2d_reflect, downsample2x, gaussian_blur, gaussian_kernel_1d,
    rgb_to_gray, separable_correlate, upscale_flow,
)
from .render import flow_magnitude, render1d, render2d

__all__ = [
    "scatter_any", "scatter_last_wins",
    "bilinear_resize", "bilinear_sample", "box_filter", "conv2d_same",
    "correlate2d_reflect", "downsample2x", "gaussian_blur",
    "gaussian_kernel_1d", "rgb_to_gray", "separable_correlate", "upscale_flow",
    "flow_magnitude", "render1d", "render2d",
]
