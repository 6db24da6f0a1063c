"""Native (C++) CPU reference engine, loaded via ctypes.

Role-parity with the reference's C++ CPU path (`Forward_cpu`/`Backward_cpu`,
reference src/dau_conv/base_dau_conv_layer.cpp:637-1100): an independent
correctness oracle and the fast backend for reference-scale differential
test matrices. Same numerics contract as ops/reference.py (which stays the
primary, dependency-free oracle); `available()` reports whether the shared
library could be built/loaded, and callers fall back to the numpy oracle.

Build: `make -C native` (or automatic on first use; needs g++).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from . import reference as _np_oracle
from ._edge import zero_edge_rows_inplace

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdau_cpu.so")

_lib = None
_load_error: Exception | None = None


def _build_and_load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        src = os.path.join(_NATIVE_DIR, "dau_cpu.cpp")
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        i64, i32, dptr = (ctypes.c_int64, ctypes.c_int32,
                          np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"))
        lib.dau_blur2d.argtypes = [dptr, i64, i64, i64, dptr, i64, i64, dptr]
        lib.dau_offset_and_sum.argtypes = [dptr, i64, i64, i64, i64, dptr,
                                           dptr, dptr, i64, i64, i64, i32, dptr]
        lib.dau_offset_and_dot.argtypes = [dptr, dptr, i64, i64, i64, i64,
                                           dptr, dptr, i64, i64, i64, i32, dptr]
        _lib = lib
    except Exception as exc:  # noqa: BLE001 - report any build/load failure
        _load_error = exc
    return _lib


def available() -> bool:
    return _build_and_load() is not None


def _blur(x, filt):
    lib = _build_and_load()
    x = np.ascontiguousarray(x, np.float64)
    filt = np.ascontiguousarray(filt, np.float64)
    n, c, h, w = x.shape
    out = np.empty_like(x)
    lib.dau_blur2d(x.reshape(n * c, h, w), n * c, h, w,
                   filt, filt.shape[0], filt.shape[1],
                   out.reshape(n * c, h, w))
    return out


def _offset_and_sum(xb, w, mu1, mu2, num_ignore, interpolate):
    lib = _build_and_load()
    n, s, h, w_sp = xb.shape
    _, s2, g, f = w.shape
    y = np.zeros((n, f, h, w_sp), np.float64)
    lib.dau_offset_and_sum(
        np.ascontiguousarray(xb, np.float64), n, s, h, w_sp,
        np.ascontiguousarray(w[0], np.float64),
        np.ascontiguousarray(mu1[0], np.float64),
        np.ascontiguousarray(mu2[0], np.float64),
        g, f, g - num_ignore, 1 if interpolate else 0, y)
    return y


def _offset_and_dot(xb, err, mu1, mu2, num_ignore, interpolate):
    lib = _build_and_load()
    n, s, h, w_sp = xb.shape
    _, s2, g, f = mu1.shape
    out = np.zeros((s, g, f), np.float64)
    lib.dau_offset_and_dot(
        np.ascontiguousarray(xb, np.float64),
        np.ascontiguousarray(err, np.float64), n, s, h, w_sp,
        np.ascontiguousarray(mu1[0], np.float64),
        np.ascontiguousarray(mu2[0], np.float64),
        g, f, g - num_ignore, 1 if interpolate else 0, out)
    return out[None]


def forward(x, w, mu1, mu2, sigma, num_dau_units_ignore=0,
            do_error_backprop=False, single_dim_kernel=False,
            aggr_forbid_positive=False, use_interpolation=True,
            blur_size=9, unit_normalization=True,
            square_unit_normalization=False):
    """Drop-in for ops.reference.forward, native-accelerated."""
    sigma_val = float(np.reshape(np.asarray(sigma), (-1,))[0])
    filt, _, _, _, err_filt = _np_oracle.make_filters(
        sigma_val, size=blur_size, single_dim_kernel=single_dim_kernel,
        forbid_positive_dim1=aggr_forbid_positive,
        unit_normalization=unit_normalization,
        square_unit_normalization=square_unit_normalization)
    f = err_filt if do_error_backprop else filt
    xb = _blur(np.asarray(x, np.float64), f)
    return _offset_and_sum(xb, np.asarray(w, np.float64),
                           np.asarray(mu1, np.float64),
                           np.asarray(mu2, np.float64),
                           num_dau_units_ignore, use_interpolation)


def backward(x, error, w, mu1, mu2, sigma, num_dau_units_ignore=0,
             unit_testing=False, single_dim_kernel=False,
             aggr_forbid_positive=False, use_interpolation=True,
             blur_size=9, unit_normalization=True,
             square_unit_normalization=False):
    """Drop-in for ops.reference.backward, native-accelerated."""
    x = np.asarray(x, np.float64)
    error = np.asarray(error, np.float64)
    w = np.asarray(w, np.float64)
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma_val = float(np.reshape(np.asarray(sigma), (-1,))[0])

    input_grad = forward(
        error, np.swapaxes(w, 1, 3), np.swapaxes(-mu1, 1, 3),
        np.swapaxes(-mu2, 1, 3), [sigma_val], do_error_backprop=True,
        single_dim_kernel=single_dim_kernel,
        aggr_forbid_positive=aggr_forbid_positive,
        use_interpolation=use_interpolation, blur_size=blur_size,
        unit_normalization=unit_normalization,
        square_unit_normalization=square_unit_normalization)

    d_w, d_mu1, d_mu2, d_sigma, _ = _np_oracle.make_filters(
        sigma_val, size=blur_size, single_dim_kernel=single_dim_kernel,
        forbid_positive_dim1=aggr_forbid_positive,
        unit_normalization=unit_normalization,
        square_unit_normalization=square_unit_normalization)

    err = error
    if unit_testing:
        err = error.copy()
        zero_edge_rows_inplace(err)

    grads = []
    for filt in (d_w, d_mu1, d_mu2, d_sigma):
        xb = _blur(x, filt)
        grads.append(_offset_and_dot(xb, err, mu1, mu2,
                                     num_dau_units_ignore, use_interpolation))
    w_grad, mu1_grad, mu2_grad, sigma_grad = grads
    return (input_grad, w_grad, mu1_grad * w, mu2_grad * w, sigma_grad * w)
