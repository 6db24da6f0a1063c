"""Framework-free numpy oracle for DAU convolution.

This is the ground-truth specification of the layer's numerics, matching the
reference project's test oracle (`DAUConvPython` in
plugins/tensorflow/tests/dau_conv_test.py:13-295) and its CPU path
(src/dau_conv/base_dau_conv_layer.cpp:637-1100). Every fast path in this
package (XLA engine, Pallas kernels) is differential-tested against it.

Written independently in vectorized numpy (the reference loops per unit in
Python); semantics are identical:

forward:
  1. blur every (n, s) plane of x with the normalized Gaussian filter
     (zero-padded correlation),
  2. per (s, g, f) unit: add ``w * shift(x_blur, mu1, mu2)`` into output
     channel f, where the sub-pixel shift is realized as 4 integer-shifted
     copies (floor offsets + {0,1} taps) weighted bilinearly.

backward:
  - input grad = the same forward applied to the error with S and F axes of
    the params swapped, mu negated, and the mirrored blur filter
    (base_dau_conv_layer.cu:294-325).
  - param grads = correlate x with each derivative filter, then per unit the
    bilinear-tap-weighted dot with the error; mu1/mu2/sigma grads are finally
    multiplied by w (base_dau_conv_layer.cu:330-356).
"""

from __future__ import annotations


import numpy as np

from ._edge import zero_edge_rows_inplace


def _grid(size: int):
    c = size // 2
    x = np.tile(np.arange(size) - c, (size, 1)).astype(np.float64)
    y = x.T.copy()
    return x, y


def make_filters(
    sigma: float,
    size: int = 9,
    single_dim_kernel: bool = False,
    forbid_positive_dim1: bool = False,
    unit_normalization: bool = True,
    square_unit_normalization: bool = False,
):
    """Blur + derivative filters; see dau_conv_test.py:177-220 for semantics."""
    x, y = _grid(size)
    r2 = x ** 2 + y ** 2
    g = np.exp(-r2 / (2.0 * sigma ** 2))

    if single_dim_kernel:
        g = np.where(y == 0, g, 0.0)
    if forbid_positive_dim1:
        g = np.where(x > 0, 0.0, g)

    d_mu1 = x / sigma ** 2 * g
    d_mu2 = y / sigma ** 2 * g
    d_sigma = r2 / sigma ** 3 * g

    # three normalization modes, matching the reference GPU precompute
    # (base_dau_conv_layer.cu:605-683): unit (f = g/sum g), square
    # (f = g/sum g^2, corrections 2*sum(g*dm)), none (no correction)
    if square_unit_normalization:
        z = np.sum(g ** 2)
        s1 = 2.0 * np.sum(g * d_mu1) / z
        s2 = 2.0 * np.sum(g * d_mu2) / z
        ss = 2.0 * np.sum(g * d_sigma) / z
    elif unit_normalization:
        z = np.sum(g)
        s1, s2, ss = np.sum(d_mu1) / z, np.sum(d_mu2) / z, np.sum(d_sigma) / z
    else:
        z = 1.0
        s1 = s2 = ss = 0.0
    g_n = g / z
    d_mu1 = d_mu1 / z - g_n * s1
    d_mu2 = d_mu2 / z - g_n * s2
    d_sigma = d_sigma / z - g_n * ss
    err = g_n[::-1, ::-1].copy()
    return g_n, d_mu1, d_mu2, d_sigma, err


def _correlate2d_zero(x: np.ndarray, filt: np.ndarray) -> np.ndarray:
    """Zero-padded 'same' correlation of each trailing-2D plane of x."""
    kh, kw = filt.shape
    ph, pw = kh // 2, kw // 2
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xp = np.zeros(lead + (h + 2 * ph, w + 2 * pw), dtype=np.float64)
    xp[..., ph:ph + h, pw:pw + w] = x
    out = np.zeros(lead + (h, w), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            fv = filt[i, j]
            if fv != 0.0:
                out += fv * xp[..., i:i + h, j:j + w]
    return out


def _taps(mu1, mu2, use_interpolation: bool):
    """Integer tap offsets and bilinear weights for each unit.

    Returns (oy, ox, tw): arrays of shape (4,) + mu.shape with the four
    (dy, dx) in {0,1}^2 taps. With interpolation off only the floor tap is
    active (weight 1), matching the oracle's Dx=[0], Dy=[0] mode.
    """
    f1 = np.floor(mu1)
    f2 = np.floor(mu2)
    a1 = mu1 - f1
    a2 = mu2 - f2
    if not use_interpolation:
        a1 = np.zeros_like(a1)
        a2 = np.zeros_like(a2)
    oy, ox, tw = [], [], []
    for dy in (0, 1):
        for dx in (0, 1):
            wx = a1 if dx else (1.0 - a1)
            wy = a2 if dy else (1.0 - a2)
            oy.append(f2.astype(np.int64) + dy)
            ox.append(f1.astype(np.int64) + dx)
            tw.append(wx * wy)
            if not use_interpolation:
                break
        if not use_interpolation:
            break
    return np.stack(oy), np.stack(ox), np.stack(tw)


def offset_and_sum(x, w, mu1, mu2, num_dau_units_ignore=0, use_interpolation=True):
    """y[n,f] = sum_{s,g} w[0,s,g,f] * bilinear_shift(x[n,s], mu1, mu2).

    Shift convention: out(i, j) reads x(i + mu2, j + mu1), zero outside
    (dau_conv_test.py:14-61).
    """
    n, s_ch, h, w_sp = x.shape
    _, s2, g_ch, f_ch = w.shape
    assert s2 == s_ch
    pad = int(np.ceil(max(np.max(np.abs(mu1)), np.max(np.abs(mu2))) + 1))
    xp = np.zeros((n, s_ch, h + 2 * pad, w_sp + 2 * pad), dtype=np.float64)
    xp[:, :, pad:pad + h, pad:pad + w_sp] = x
    oy, ox, tw = _taps(mu1, mu2, use_interpolation)
    g_used = g_ch - num_dau_units_ignore

    y = np.zeros((n, f_ch, h, w_sp), dtype=np.float64)
    for s in range(s_ch):
        for g in range(g_used):
            for t in range(oy.shape[0]):
                for f in range(f_ch):
                    wt = w[0, s, g, f] * tw[t, 0, s, g, f]
                    if wt == 0.0:
                        continue
                    ys = pad + int(oy[t, 0, s, g, f])
                    xs = pad + int(ox[t, 0, s, g, f])
                    y[:, f] += wt * xp[:, s, ys:ys + h, xs:xs + w_sp]
    return y


def offset_and_dot(x, error, mu1, mu2, num_dau_units_ignore=0,
                   ignore_edge_gradients=False, use_interpolation=True):
    """out[0,s,g,f] = sum_{n,px} x[n,s,px+mu] * error[n,f,px], bilinear taps.

    ``ignore_edge_gradients`` replicates the reference GPU tiling artifact
    used only under unit_testing: the last output column/row is zeroed when
    the output size divides the CUDA tile size (dau_conv_test.py:107-136).
    """
    n, s_ch, h, w_sp = x.shape
    _, s2, g_ch, f_ch = mu1.shape
    err = np.array(error, dtype=np.float64, copy=True)

    if ignore_edge_gradients:
        zero_edge_rows_inplace(err)

    pad = int(np.ceil(max(np.max(np.abs(mu1)), np.max(np.abs(mu2))) + 1))
    xp = np.zeros((n, s_ch, h + 2 * pad, w_sp + 2 * pad), dtype=np.float64)
    xp[:, :, pad:pad + h, pad:pad + w_sp] = x
    oy, ox, tw = _taps(mu1, mu2, use_interpolation)
    g_used = g_ch - num_dau_units_ignore

    out = np.zeros((1, s_ch, g_ch, f_ch), dtype=np.float64)
    for s in range(s_ch):
        for g in range(g_used):
            for t in range(oy.shape[0]):
                for f in range(f_ch):
                    ys = pad + int(oy[t, 0, s, g, f])
                    xs = pad + int(ox[t, 0, s, g, f])
                    dot = np.sum(xp[:, s, ys:ys + h, xs:xs + w_sp] * err[:, f])
                    out[0, s, g, f] += dot * tw[t, 0, s, g, f]
    return out


def forward(x, w, mu1, mu2, sigma, num_dau_units_ignore=0,
            do_error_backprop=False, single_dim_kernel=False,
            aggr_forbid_positive=False, use_interpolation=True,
            blur_size=9, unit_normalization=True,
            square_unit_normalization=False):
    """Oracle forward pass: blur then offset-and-sum."""
    sigma_val = float(np.reshape(np.asarray(sigma), (-1,))[0])
    filt, _, _, _, err_filt = make_filters(
        sigma_val, size=blur_size, single_dim_kernel=single_dim_kernel,
        forbid_positive_dim1=aggr_forbid_positive,
        unit_normalization=unit_normalization,
        square_unit_normalization=square_unit_normalization)
    f = err_filt if do_error_backprop else filt
    x_blur = _correlate2d_zero(np.asarray(x, dtype=np.float64), f)
    return offset_and_sum(x_blur, np.asarray(w, np.float64),
                          np.asarray(mu1, np.float64), np.asarray(mu2, np.float64),
                          num_dau_units_ignore=num_dau_units_ignore,
                          use_interpolation=use_interpolation)


def backward(x, error, w, mu1, mu2, sigma, num_dau_units_ignore=0,
             unit_testing=False, single_dim_kernel=False,
             aggr_forbid_positive=False, use_interpolation=True,
             blur_size=9, unit_normalization=True,
             square_unit_normalization=False):
    """Oracle backward: (input_grad, w_grad, mu1_grad, mu2_grad, sigma_grad).

    Input grad rotates the units (swap S<->F, negate mu) and uses the
    mirrored blur filter; param grads correlate x with each derivative
    filter then offset-and-dot against the error; mu/sigma grads are
    multiplied by w (dau_conv_test.py:222-295).
    """
    x = np.asarray(x, np.float64)
    error = np.asarray(error, np.float64)
    w = np.asarray(w, np.float64)
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma_val = float(np.reshape(np.asarray(sigma), (-1,))[0])

    input_grad = forward(
        error,
        np.swapaxes(w, 1, 3), np.swapaxes(-mu1, 1, 3), np.swapaxes(-mu2, 1, 3),
        [sigma_val], do_error_backprop=True,
        single_dim_kernel=single_dim_kernel,
        aggr_forbid_positive=aggr_forbid_positive,
        use_interpolation=use_interpolation, blur_size=blur_size,
        unit_normalization=unit_normalization,
        square_unit_normalization=square_unit_normalization)

    # the w-gradient filter is the normalized blur filter itself
    # (reference oracle: deriv_w = filter / sum, dau_conv_test.py:201,212)
    d_w, d_mu1, d_mu2, d_sigma, _ = make_filters(
        sigma_val, size=blur_size, single_dim_kernel=single_dim_kernel,
        forbid_positive_dim1=aggr_forbid_positive,
        unit_normalization=unit_normalization,
        square_unit_normalization=square_unit_normalization)

    grads = []
    for filt in (d_w, d_mu1, d_mu2, d_sigma):
        xb = _correlate2d_zero(x, filt)
        grads.append(offset_and_dot(
            xb, error, mu1, mu2,
            num_dau_units_ignore=num_dau_units_ignore,
            ignore_edge_gradients=unit_testing,
            use_interpolation=use_interpolation))
    w_grad, mu1_grad, mu2_grad, sigma_grad = grads
    mu1_grad = mu1_grad * w
    mu2_grad = mu2_grad * w
    sigma_grad = sigma_grad * w
    return input_grad, w_grad, mu1_grad, mu2_grad, sigma_grad
