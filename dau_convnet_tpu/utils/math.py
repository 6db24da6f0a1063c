"""Math utility parity shims (reference `caffe_gpu_*` family).

The reference ships a C++/CUDA math layer (include/dau_conv/util/
math_functions.hpp:16-209 plus kernels in math_functions.cu): cuBLAS
wrappers and bespoke elementwise kernels. On TPU every one of these is a
one-line jnp expression that XLA fuses into surrounding computation - no
library needed. They are provided here under their reference names so users
porting code (and the component inventory) have a 1:1 mapping:

| reference (math_functions.cu) | here |
|---|---|
| caffe_gpu_clip_lower/upper (:242-289) | clip_lower / clip_upper |
| caffe_gpu_clip_eps (:292-310)         | clip_eps |
| caffe_gpu_clip_nan (:313-331)         | clip_nan |
| caffe_gpu_pad2d (:386-405)            | pad2d |
| caffe_gpu_amax via cublasIsamax (:407-422) | amax |
| caffe_gpu_sum via CUB segmented reduce (:360-372) | segmented_sum |
| caffe_gpu_gemm/gemv/axpy/scal/...     | jnp.dot / jnp ops (not wrapped) |
| im2col_cpu (util/im2col.cpp:20-57)    | im2col (CPU-oracle helper) |
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["clip_lower", "clip_upper", "clip_eps", "clip_nan", "pad2d",
           "amax", "segmented_sum", "im2col"]


def clip_lower(x, lower):
    """max(x, lower) elementwise (reference math_functions.cu:242-265)."""
    return jnp.maximum(x, lower)


def clip_upper(x, upper):
    """min(x, upper) elementwise (reference math_functions.cu:268-289)."""
    return jnp.minimum(x, upper)


def clip_eps(x, eps):
    """Zero values with |x| <= eps (reference math_functions.cu:292-310)."""
    return jnp.where(jnp.abs(x) > eps, x, jnp.zeros_like(x))


def clip_nan(x):
    """NaN -> 0 (reference math_functions.cu:313-331)."""
    return jnp.nan_to_num(x, nan=0.0, posinf=None, neginf=None)


def pad2d(x, pad: int, value=0.0):
    """Pad the trailing two (spatial) dims (reference math_functions.cu:386-405)."""
    cfg = [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(x, cfg, constant_values=value)


def amax(x):
    """max |x| (reference cublasIsamax wrapper, math_functions.cu:407-422).

    Note: the reference reads this back to the host each step to pick a
    CUDA kernel tier; under jit that dispatch is static - see utils.tiers.
    """
    return jnp.max(jnp.abs(x))


def segmented_sum(x, segment_size: int):
    """Sum over contiguous segments of the flattened input (reference CUB
    DeviceSegmentedReduce::Sum, math_functions.cu:360-372)."""
    flat = jnp.reshape(x, (-1, segment_size))
    return jnp.sum(flat, axis=-1)


def im2col(x, kh: int, kw: int, pad: int = 0, stride: int = 1):
    """Caffe-style im2col of a (C, H, W) plane -> (C*kh*kw, out_h*out_w)
    (reference util/im2col.cpp:20-57). Only used by oracle-style CPU code;
    the compute path uses direct convolution."""
    c, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    out_h = (h + 2 * pad - kh) // stride + 1
    out_w = (w + 2 * pad - kw) // stride + 1
    cols = []
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + out_h * stride:stride, j:j + out_w * stride:stride]
            cols.append(patch.reshape(c, out_h * out_w))
    col = jnp.stack(cols, axis=1)  # (C, kh*kw, L)
    return col.reshape(c * kh * kw, out_h * out_w)
