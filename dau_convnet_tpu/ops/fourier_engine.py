"""Fourier engine: DAU aggregation as per-frequency contractions.

The spatial XLA engine (xla_engine.py) pays ks^2 dense-conv FLOPs per
(s, f, pixel) for what is mathematically a 4-tap gather - a structural
ks^2/(4G) FLOP overhead (~10x at ks=9, G=2) that round 1 identified as the
gap to the plain-conv baseline. This engine removes it EXACTLY (not an
approximation: same zero-padding semantics, validated to FFT roundoff
against the numpy oracle) by moving the aggregation to the frequency
domain, where the sub-pixel bilinear shift of the reference's
`perpare_weights_and_offsets` precompute (dau_conv_forward_core.hpp:
1858-2217) becomes an analytic 2-tap phase factor:

    shift by mu  <->  multiply by  (1-a) e^{i w f} + a e^{i w (f+1)},
                      f = floor(mu), a = mu - f

so the whole offset-and-sum collapses to one small complex matmul per
frequency bin:

    Y[n,f,k] = sum_s X[n,s,k] * Phi[s,f,k],
    Phi[s,f,k] = sum_g w[s,g,f] * py[s,g,f,k1] * px[s,g,f,k2]

with FLOPs ~ 4*bins*N*S*F instead of 2*N*S*F*H*W*ks^2 - a 10-20x
reduction at AlexNet shapes. The backward position table is the same trick
on cross-spectra:

    T[s,f,p] = sum_{n,ij} xb[n,s,ij+p] err[n,f,ij]
             = partial-iDFT_p( sum_n X[n,s,k] conj(E[n,f,k]) )

Everything is real-arithmetic matmuls (complex hand-rolled as re/im pairs
so the production path can run bf16 on the MXU with f32 accumulation);
DFTs are expressed as matrix products against precomputed (static) DFT
matrices - at these sizes (P <= 36) that is faster and more dtype-flexible
than the XLA FFT op. Zero-padding semantics match the oracle exactly: the
DFT matrices embed the zero padding (signal support H < transform length
P >= H + ks//2 guarantees no circular wrap).

The input gradient needs no second phase table: Phi(-mu) = conj(Phi(mu))
exactly (floor/frac identities), so dx reuses the forward Phi conjugated
and S<->F-transposed - the Fourier image of the reference's
"transpose channels + negate mu" backprop identity
(base_dau_conv_layer.cu:294-325).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["fourier_forward", "fourier_grad_tables", "plan_bins"]


def plan_bins(h: int, w: int, ks: int):
    """Transform lengths (P1, P2) and rfft bin count for an H x W image with
    aggregation taps reaching ks//2: P >= H + ks//2 prevents circular wrap of
    the zero-padded correlation (validated exact in tests)."""
    c = ks // 2
    p1, p2 = h + c, w + c
    return p1, p2, p2 // 2 + 1


def _dft_mats(n_in: int, p: int, nbins: int, dtype):
    """(n_in, nbins) cos/sin matrices: X[k] = sum_i x[i] e^{-2 pi i k i / p}.

    Input support n_in < p embeds the zero padding for free."""
    i = np.arange(n_in)[:, None]
    k = np.arange(nbins)[None, :]
    ang = -2.0 * np.pi * i * k / p
    return jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype)


def _idft_mats(p1: int, p2: int, rb: int, out1, out2, dtype, scale=1.0):
    """Partial inverse-rDFT matrices evaluating the real inverse transform at
    row indices `out1` and column indices `out2` (may be negative: circular).

    Returns (C, S) with shape (p1*rb, len(out1)*len(out2)) such that
    y = (Xre @ C - Xim @ S) recovers the real inverse at those positions,
    including the rfft conjugate-half weighting."""
    k1 = np.arange(p1)
    k2 = np.arange(rb)
    w2 = np.full(rb, 2.0)
    w2[0] = 1.0
    if p2 % 2 == 0:
        w2[-1] = 1.0
    o1 = np.asarray(out1)[:, None]
    o2 = np.asarray(out2)[None, :]
    ang1 = 2.0 * np.pi * k1[:, None, None, None] * o1[None, None, :, :] / p1
    ang2 = 2.0 * np.pi * k2[None, :, None, None] * o2[None, None, :, :] / p2
    ang = ang1 + ang2  # (p1, rb, len1, len2)
    coef = w2[None, :, None, None] * scale / (p1 * p2)
    cmat = (np.cos(ang) * coef).reshape(p1 * rb, len(out1) * len(out2))
    smat = (np.sin(ang) * coef).reshape(p1 * rb, len(out1) * len(out2))
    return jnp.asarray(cmat, dtype), jnp.asarray(smat, dtype)


def _rdft2(x, p1: int, p2: int, rb: int, precision):
    """Batched 2D rDFT of (..., H, W) real input -> (..., p1*rb) complex as an
    (re, im) pair, via two matmul stages (zero padding embedded)."""
    h, w = x.shape[-2:]
    dtype = x.dtype
    c2, s2 = _dft_mats(w, p2, rb, dtype)
    # stage 1: columns (j -> k2)
    are = jnp.matmul(x, c2, precision=precision)
    aim = jnp.matmul(x, s2, precision=precision)
    # stage 2: rows (i -> k1); contract the H axis
    c1, s1 = _dft_mats(h, p1, p1, dtype)
    # (..., H, rb) x (H, p1) -> (..., p1, rb)
    xre = (jnp.einsum("...hx,hy->...yx", are, c1, precision=precision)
           - jnp.einsum("...hx,hy->...yx", aim, s1, precision=precision))
    xim = (jnp.einsum("...hx,hy->...yx", are, s1, precision=precision)
           + jnp.einsum("...hx,hy->...yx", aim, c1, precision=precision))
    lead = x.shape[:-2]
    return xre.reshape(*lead, p1 * rb), xim.reshape(*lead, p1 * rb)


def _tap_phase(mu, p: int, nbins: int, use_interpolation: bool):
    """Per-bin complex factor of the (bilinear) 1D shift-by-mu read, as
    (re, im), shape mu.shape + (nbins,). Phase convention matches _rdft2 /
    _idft_mats (correlation read at +d -> e^{+2 pi i k d / p})."""
    f = jnp.floor(mu)
    if use_interpolation:
        a = mu - f
    else:
        a = jnp.zeros_like(mu)
    k = jnp.arange(nbins, dtype=mu.dtype)
    ang0 = (2.0 * np.pi / p) * f[..., None] * k
    ang1 = ang0 + (2.0 * np.pi / p) * k
    b = a[..., None]
    re = (1.0 - b) * jnp.cos(ang0) + b * jnp.cos(ang1)
    im = (1.0 - b) * jnp.sin(ang0) + b * jnp.sin(ang1)
    return re, im


def build_phi(w, mu1, mu2, p1: int, p2: int, rb: int,
              use_interpolation: bool = True):
    """Phi[s,f,k] = sum_g w * py(k1) * px(k2), flat bins k = k1*rb + k2.

    Built as G broadcast-FMA passes (G is 1-4), NOT a 3-operand einsum over
    the phase factors (the round-1 tiny-batched-matmul trap)."""
    s, g, f = w.shape
    pyre, pyim = _tap_phase(mu2, p1, p1, use_interpolation)   # (S,G,F,p1)
    pxre, pxim = _tap_phase(mu1, p2, rb, use_interpolation)   # (S,G,F,rb)
    phire = jnp.zeros((s, f, p1 * rb), w.dtype)
    phiim = jnp.zeros((s, f, p1 * rb), w.dtype)
    for gi in range(g):
        wre = w[:, gi, :, None, None]
        yre = pyre[:, gi, :, :, None]
        yim = pyim[:, gi, :, :, None]
        xre = pxre[:, gi, :, None, :]
        xim = pxim[:, gi, :, None, :]
        re = (yre * xre - yim * xim)
        im = (yre * xim + yim * xre)
        phire = phire + (wre * re).reshape(s, f, p1 * rb)
        phiim = phiim + (wre * im).reshape(s, f, p1 * rb)
    return phire, phiim


def _bin_matmul(are, aim, bre, bim, precision, conj_b=False):
    """Per-bin complex contraction: out[k,m,n] = sum_c A[k,m,c] * B[k,c,n]
    (4 real batched matmuls; f32 accumulation via preferred_element_type)."""
    if conj_b:
        bim = -bim
    dn = (((2,), (1,)), ((0,), (0,)))  # contract c, batch k

    def mm(x, y):
        return jax.lax.dot_general(x, y, dn, precision=precision,
                                   preferred_element_type=jnp.float32)

    return (mm(are, bre) - mm(aim, bim)), (mm(are, bim) + mm(aim, bre))


def fourier_forward(x_blur, w, mu1, mu2, ks: int,
                    use_interpolation: bool = True,
                    precision=jax.lax.Precision.DEFAULT):
    """Offset-and-sum over (s, g) units via per-frequency contraction.

    Drop-in equivalent of xla_engine.aggregate_forward (same zero-padded
    bilinear-shift semantics, exact up to roundoff).

    Args:
      x_blur: (N, S, H, W) pre-blurred input.
      w, mu1, mu2: (S, G, F) unit parameters (w already dummy-masked).

    Returns: (N, F, H, W).
    """
    n, s, h, wd = x_blur.shape
    f = w.shape[-1]
    p1, p2, rb = plan_bins(h, wd, ks)
    dtype = x_blur.dtype

    xre, xim = _rdft2(x_blur, p1, p2, rb, precision)       # (N,S,B)
    phire, phiim = build_phi(w.astype(dtype), mu1.astype(dtype),
                             mu2.astype(dtype), p1, p2, rb, use_interpolation)

    # per-bin: Y[k,n,f] = sum_s X[k,n,s] Phi[k,s,f]
    xre_t = jnp.transpose(xre, (2, 0, 1))
    xim_t = jnp.transpose(xim, (2, 0, 1))
    pre_t = jnp.transpose(phire, (2, 0, 1))
    pim_t = jnp.transpose(phiim, (2, 0, 1))
    yre, yim = _bin_matmul(xre_t, xim_t, pre_t, pim_t, precision)  # (B,N,F) f32

    # partial inverse rDFT at the H x W output positions
    cmat, smat = _idft_mats(p1, p2, rb, np.arange(h), np.arange(wd),
                            jnp.float32)
    yre = jnp.transpose(yre, (1, 2, 0))  # (N,F,B)
    yim = jnp.transpose(yim, (1, 2, 0))
    out = (jnp.matmul(yre, cmat, precision=precision)
           - jnp.matmul(yim, smat, precision=precision))
    return out.reshape(n, f, h, wd).astype(dtype)


def fourier_grad_tables(x_blur_k, err, ks: int,
                        precision=jax.lax.Precision.DEFAULT):
    """Position table T[m,s,f,ky,kx] = sum_{n,ij} xbk[m,n,s,ij+p] err[n,f,ij]
    via cross-spectra - drop-in equivalent of xla_engine.grad_tables.

    Args:
      x_blur_k: (M, N, S, H, W) derivative-blurred inputs.
      err: (N, F, H, W).

    Returns: (M, S, F, ks, ks) float32.
    """
    m, n, s, h, wd = x_blur_k.shape
    f = err.shape[1]
    p1, p2, rb = plan_bins(h, wd, ks)
    c = ks // 2

    xre, xim = _rdft2(x_blur_k, p1, p2, rb, precision)      # (M,N,S,B)
    ere, eim = _rdft2(err, p1, p2, rb, precision)           # (N,F,B)

    # That[m,s,f,k] = sum_n X[m,n,s,k] * conj(E[n,f,k])
    # per-bin matmul with A[k, m*s, n], B[k, n, f]
    xre_t = jnp.transpose(xre, (3, 0, 2, 1)).reshape(-1, m * s, n)
    xim_t = jnp.transpose(xim, (3, 0, 2, 1)).reshape(-1, m * s, n)
    ere_t = jnp.transpose(ere, (2, 0, 1))
    eim_t = jnp.transpose(eim, (2, 0, 1))
    tre, tim = _bin_matmul(xre_t, xim_t, ere_t, eim_t, precision,
                           conj_b=True)                      # (B, M*S, F) f32

    pos = np.arange(-c, c + 1)
    cmat, smat = _idft_mats(p1, p2, rb, pos, pos, jnp.float32)
    tre = jnp.transpose(tre, (1, 2, 0))  # (M*S, F, B)
    tim = jnp.transpose(tim, (1, 2, 0))
    table = (jnp.matmul(tre, cmat, precision=precision)
             - jnp.matmul(tim, smat, precision=precision))
    return table.reshape(m, s, f, ks, ks)
