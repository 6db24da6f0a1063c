from .dau_conv import DAUConvSettings, dau_conv2d_op, edge_gradient_mask
from .gaussian import blur_kernel_size, depthwise_blur, gaussian_filters

__all__ = [
    "DAUConvSettings",
    "dau_conv2d_op",
    "edge_gradient_mask",
    "blur_kernel_size",
    "depthwise_blur",
    "gaussian_filters",
]
