from .dau_conv import (DAUConvSettings, dau_conv2d_infer, dau_conv2d_op,
                       edge_gradient_mask, precompute_phi)
from .shared_engine import dau_conv2d_shared_op
from .gaussian import blur_kernel_size, depthwise_blur, gaussian_filters

__all__ = [
    "DAUConvSettings",
    "dau_conv2d_op",
    "dau_conv2d_infer",
    "dau_conv2d_shared_op",
    "precompute_phi",
    "edge_gradient_mask",
    "blur_kernel_size",
    "depthwise_blur",
    "gaussian_filters",
]
