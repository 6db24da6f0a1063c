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

    Y[k,n,f] = sum_s X[k,n,s] * Phi[k,s,f],
    Phi[k,s,f] = sum_g w[s,g,f] * py[k1] * px[k2]      (k = k1*rb + k2)

with FLOPs ~ 4*bins*N*S*F instead of 2*N*S*F*H*W*ks^2 - a 10-20x
reduction at AlexNet shapes (measured on a v5e: the per-bin matmul runs
the conv4 aggregation in 0.13 ms vs 0.79 ms for the dense conv). The
backward position table is the same trick on cross-spectra:

    T[s,f,p] = sum_{n,ij} xb[n,s,ij+p] err[n,f,ij]
             = partial-iDFT_p( sum_n X[k,s,n] conj(E[k,n,f]) )

Everything is real-arithmetic matmuls (complex hand-rolled as re/im pairs
so the production path can run bf16 on the MXU with f32 accumulation);
DFTs are expressed as matrix products against precomputed (static) DFT
matrices - at these sizes (P <= 36) that is faster and more dtype-flexible
than the XLA FFT op. Zero-padding semantics match the oracle exactly: the
DFT matrices embed the zero padding (signal support H < transform length
P >= H + ks//2 guarantees no circular wrap).

Layout/precision rules learned on-chip (benchmarks/fourier_parts.py):
- Phi is built directly in bin-major (B, S, F) layout as ONE fused
  product-reduce over g per re/im - a post-hoc transpose or per-g
  accumulation loop costs ~4x the whole build in HBM traffic.
- Phase ANGLES are always computed in f32: angles reach ~2 pi * f * k
  (tens of radians), where bf16 quantization is O(0.25 rad) - the phase
  VALUES may then be cast to bf16 safely ([-1, 1] range).
- Cross-spectra are cast to the operand dtype before the partial iDFT
  (fused into the matmul epilogue), halving the one large intermediate.

The input gradient needs no second phase table: Phi(-mu) = conj(Phi(mu))
exactly (floor/frac identities), so dx reuses the forward Phi conjugated
with the contraction taken over the F axis - the Fourier image of the
reference's "transpose channels + negate mu" backprop identity
(base_dau_conv_layer.cu:294-325). `dau_conv.py` stashes Phi in the VJP
residuals so forward and backward share one build.

Numerics note (round-3 extended fuzz): entries that are STRUCTURAL zeros
in the dense formulation - e.g. a unit whose whole window falls outside a
small image at the k=33/65 tiers with offsets near the clip bound - come
out of the spectral sums as ~3e-6 * tensor-scale cancellation residue
instead of exact 0.0 (many phase terms summing to zero in f32). This is
f32-roundoff-exact relative to the participating magnitudes; differential
tests at those configs use the scale-aware absolute floor
(tests/helpers.py::assert_matrix(scale_aware=True)).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["fourier_forward", "fourier_apply_phi", "fourier_input_grad",
           "fourier_grad_tables", "build_phi", "plan_bins"]


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


def _idft_mats(p1: int, p2: int, rb: int, out1, out2, dtype,
               apply_coef: bool = True):
    """Partial inverse-rDFT matrices evaluating the real inverse transform at
    row indices `out1` and column indices `out2` (may be negative: circular).

    Returns (C, S) with shape (p1*rb, len(out1)*len(out2)) such that
    y = (Xre @ C - Xim @ S) recovers the real inverse at those positions,
    including the rfft conjugate-half weighting. apply_coef=False omits the
    w2/(P1*P2) coefficient (for spectra that already carry it, e.g. the
    fused kernel's dx output whose phase tables fold it in)."""
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
    if apply_coef:
        coef = w2[None, :, None, None] / (p1 * p2)
    else:
        coef = 1.0
    cmat = (np.cos(ang) * coef).reshape(p1 * rb, len(out1) * len(out2))
    smat = (np.sin(ang) * coef).reshape(p1 * rb, len(out1) * len(out2))
    return jnp.asarray(cmat, dtype), jnp.asarray(smat, dtype)


def _rdft2(x, p1: int, p2: int, rb: int, precision):
    """Batched 2D rDFT of (..., H, W) real input -> (..., p1*rb) complex as an
    (re, im) pair, via two matmul stages (zero padding embedded)."""
    h, w = x.shape[-2:]
    dtype = x.dtype
    c2, s2 = _dft_mats(w, p2, rb, dtype)
    are = jnp.matmul(x, c2, precision=precision)
    aim = jnp.matmul(x, s2, precision=precision)
    c1, s1 = _dft_mats(h, p1, p1, dtype)
    xre = (jnp.einsum("...hx,hy->...yx", are, c1, precision=precision)
           - jnp.einsum("...hx,hy->...yx", aim, s1, precision=precision))
    xim = (jnp.einsum("...hx,hy->...yx", are, s1, precision=precision)
           + jnp.einsum("...hx,hy->...yx", aim, c1, precision=precision))
    lead = x.shape[:-2]
    return xre.reshape(*lead, p1 * rb), xim.reshape(*lead, p1 * rb)


def _tap_phase(mu, p: int, nbins: int, use_interpolation: bool, out_dtype,
               bin_leading: bool = False):
    """Per-bin complex factor of the (bilinear) 1D shift-by-mu read, as
    (re, im), shape mu.shape + (nbins,) - or (nbins,) + mu.shape when
    bin_leading (built natively in that layout; a post-hoc transpose of the
    factors costs ~0.1 ms/layer at AlexNet shapes). ANGLES are computed in
    f32 regardless of out_dtype (see module docstring); results are cast."""
    mu32 = mu.astype(jnp.float32)
    f = jnp.floor(mu32)
    if use_interpolation:
        a = mu32 - f
    else:
        a = jnp.zeros_like(mu32)
    if bin_leading:
        k = jnp.arange(nbins, dtype=jnp.float32).reshape(
            (nbins,) + (1,) * mu.ndim)
        f = f[None]
        b = a[None]
    else:
        k = jnp.arange(nbins, dtype=jnp.float32)
        f = f[..., None]
        b = a[..., None]
    ang0 = (2.0 * np.pi / p) * f * k
    ang1 = ang0 + (2.0 * np.pi / p) * k
    re = (1.0 - b) * jnp.cos(ang0) + b * jnp.cos(ang1)
    im = (1.0 - b) * jnp.sin(ang0) + b * jnp.sin(ang1)
    return re.astype(out_dtype), im.astype(out_dtype)


def _phase_onehot(mu, span: int, use_interpolation: bool):
    """Bilinear one-hot weights over integer exponents:
    A[j, ...] = (1-a)[j == floor(mu)+span] + a[j == floor(mu)+span+1],
    shape (2*span+2,) + mu.shape, f32. floor(mu) clamped to [-span, span]."""
    mu32 = mu.astype(jnp.float32)
    f = jnp.floor(mu32)
    a = mu32 - f if use_interpolation else jnp.zeros_like(mu32)
    f = jnp.clip(f, -span, span)
    nj = 2 * span + 2
    jidx = f + span
    jio = jnp.arange(nj, dtype=jnp.float32).reshape((nj,) + (1,) * mu.ndim)
    return (jnp.where(jio == jidx[None], 1.0 - a[None], 0.0)
            + jnp.where(jio == jidx[None] + 1.0, a[None], 0.0))


def _phase_table_host(p: int, nbins: int, span: int):
    """Static stacked [cos; sin] table (2*nbins, 2*span+2) for integer
    exponents e in [-span, span+1]: row k of cos-half is cos(2 pi k e / p).
    Computed f64 host-side."""
    nj = 2 * span + 2
    k = np.arange(nbins)[:, None]
    e = np.arange(nj)[None, :] - span
    ang = 2.0 * np.pi * k * e / p
    return np.concatenate([np.cos(ang), np.sin(ang)])


def _tap_phase_tables(mu, p: int, nbins: int, use_interpolation: bool,
                      out_dtype, span: int, precision):
    """`_tap_phase` (bin-leading) without runtime transcendentals.

    floor(mu) is an INTEGER in [-span, span] (mu is clipped to
    +-(ks//2 - border) before the op), so e^{2 pi i k floor(mu) / p} is a
    lookup into a static (nbins, 2*span+2) cos/sin table. The lookup is
    realized as one skinny matmul of the stacked [cos; sin] table against
    the bilinear one-hot weights  A[j, sgf] = (1-a)[j==f+span] + a[j==f+span+1]
    - compare-FMAs plus an MXU contraction over ~ks+3 entries replace
    ~4*nbins*S*G*F cos/sin evaluations. floor(mu) outside the span is
    clamped (out-of-contract inputs only; the trig path would wrap instead).

    Returns (re, im), each (nbins,) + mu.shape, cast to out_dtype.
    """
    nj = 2 * span + 2                      # exponents -span .. span+1
    onehot = _phase_onehot(mu, span, use_interpolation)
    tab = jnp.asarray(_phase_table_host(p, nbins, span), out_dtype)
    res = jax.lax.dot_general(
        tab, onehot.reshape(nj, -1).astype(out_dtype),
        (((1,), (0,)), ((), ())), precision=precision,
        preferred_element_type=jnp.float32)
    res = res.reshape((2, nbins) + mu.shape).astype(out_dtype)
    return res[0], res[1]


def build_phi(w, mu1, mu2, p1: int, p2: int, rb: int,
              use_interpolation: bool = True, phase_span: int | None = None,
              precision=jax.lax.Precision.DEFAULT):
    """Phi[k,s,f] = sum_g w * py(k1) * px(k2), bin-major, k = k1*rb + k2.

    One fused broadcast-product + reduce over g per component (no per-g
    accumulation loop, no trailing transpose - both measured ~4x slower in
    HBM traffic on a v5e; and never a 3-operand einsum over the phase
    factors, the round-1 tiny-batched-matmul trap).

    phase_span: when given (ks//2 + 1 for a ks-tap layer), the tap-phase
    factors come from integer cos/sin tables via a skinny matmul
    (_tap_phase_tables) instead of runtime transcendentals."""
    s, g, f = w.shape
    dtype = w.dtype
    if phase_span is not None:
        pyre, pyim = _tap_phase_tables(mu2, p1, p1, use_interpolation, dtype,
                                       phase_span, precision)  # (P1,S,G,F)
        pxre, pxim = _tap_phase_tables(mu1, p2, rb, use_interpolation, dtype,
                                       phase_span, precision)  # (rb,S,G,F)
    else:
        pyre, pyim = _tap_phase(mu2, p1, p1, use_interpolation, dtype,
                                bin_leading=True)  # (P1,S,G,F)
        pxre, pxim = _tap_phase(mu1, p2, rb, use_interpolation, dtype,
                                bin_leading=True)  # (rb,S,G,F)
    # bin-major factor views: (P1, 1, S, G, F) x (1, rb, S, G, F)
    yre = pyre[:, None]
    yim = pyim[:, None]
    xre = pxre[None]
    xim = pxim[None]
    wb = w[None, None]  # (1, 1, S, G, F)
    phire = jnp.sum(wb * (yre * xre - yim * xim), axis=3)  # (P1, rb, S, F)
    phiim = jnp.sum(wb * (yre * xim + yim * xre), axis=3)
    return phire.reshape(p1 * rb, s, f), phiim.reshape(p1 * rb, s, f)


def _bin_matmul(are, aim, bre, bim, precision, conj_b=False,
                contract=(2, 1), out_dtype=jnp.float32):
    """Per-bin complex contraction over one axis pair (batched over bins,
    dim 0). Default contracts A[k,m,c] x B[k,c,n] -> out[k,m,n]. 4 real
    batched matmuls with f32 accumulation; output cast to out_dtype in the
    matmul epilogue (fused by XLA)."""
    if conj_b:
        bim = -bim
    dn = (((contract[0],), (contract[1],)), ((0,), (0,)))

    def mm(x, y):
        return jax.lax.dot_general(x, y, dn, precision=precision,
                                   preferred_element_type=jnp.float32)

    re = (mm(are, bre) - mm(aim, bim)).astype(out_dtype)
    im = (mm(are, bim) + mm(aim, bre)).astype(out_dtype)
    return re, im


def fourier_apply_phi(x_blur, phire, phiim, h, w_sp, p1, p2, rb, precision,
                      contract_f: bool = False, conj_phi: bool = False,
                      stacked: bool = False):
    """Spectral core: transform x, contract against Phi per bin, transform
    back. With contract_f=True the contraction runs over Phi's F axis
    (producing the S-channel output of the input-gradient path).

    Default: four N-row per-bin matmuls. The `stacked` variant runs TWO
    matmuls with X's re/im stacked along rows (2N) - double the MXU row
    utilization standalone, but measured 0.26 ms SLOWER per AlexNet-DAU
    step in-context (the concat + bigger transpose break XLA's fusion with
    the DFT stage); kept as an explicit parameter for re-evaluation at
    other batch sizes (was a trace-time env knob, retired per round-2
    advice)."""
    n = x_blur.shape[0]
    dtype = x_blur.dtype
    xre, xim = _rdft2(x_blur, p1, p2, rb, precision)       # (N,C,B)
    if stacked:
        xs = jnp.concatenate([xre, xim], axis=0)           # (2N,C,B)
        xs_t = jnp.transpose(xs, (2, 0, 1))                # (B,2N,C)
        ci = 2 if contract_f else 1
        flip = (not conj_phi) if contract_f else conj_phi
        dn = (((2,), (ci,)), ((0,), (0,)))

        def mm(a, b):
            return jax.lax.dot_general(a, b, dn, precision=precision,
                                       preferred_element_type=jnp.float32)

        mm1 = mm(xs_t, phire)              # [Xre@Pre; Xim@Pre]
        mm2 = mm(xs_t, phiim)              # [Xre@Pim; Xim@Pim]
        if flip:
            mm2 = -mm2
        yre = mm1[:, :n] - mm2[:, n:]
        yim = mm2[:, :n] + mm1[:, n:]
    else:
        xre_t = jnp.transpose(xre, (2, 0, 1))              # (B,N,C)
        xim_t = jnp.transpose(xim, (2, 0, 1))
        if contract_f:
            yre, yim = _bin_matmul(xre_t, xim_t, phire, phiim, precision,
                                   conj_b=not conj_phi, contract=(2, 2),
                                   out_dtype=jnp.float32)
        else:
            yre, yim = _bin_matmul(xre_t, xim_t, phire, phiim, precision,
                                   conj_b=conj_phi, contract=(2, 1),
                                   out_dtype=jnp.float32)
    return _spectra_to_image(yre, yim, p1, p2, rb, h, w_sp,
                             precision).astype(dtype)


def _spectra_to_image(yre, yim, p1, p2, rb, h, w_sp, precision,
                      apply_coef: bool = True):
    """Partial inverse rDFT of per-bin spectra (B, N, C) -> (N, C, H, W)
    float32: out[n,c,ij] = sum_k yre[k,n,c] C[k,ij] - yim[k,n,c] S[k,ij]."""
    n, cout = yre.shape[1], yre.shape[2]
    cmat, smat = _idft_mats(p1, p2, rb, np.arange(h), np.arange(w_sp),
                            jnp.float32, apply_coef=apply_coef)
    out = (jax.lax.dot_general(jnp.transpose(yre, (1, 2, 0)).reshape(-1, p1 * rb),
                               cmat, (((1,), (0,)), ((), ())),
                               precision=precision)
           - jax.lax.dot_general(jnp.transpose(yim, (1, 2, 0)).reshape(-1, p1 * rb),
                                 smat, (((1,), (0,)), ((), ())),
                                 precision=precision))
    return out.reshape(n, cout, h, w_sp)


def fourier_forward(x_blur, w, mu1, mu2, ks: int,
                    use_interpolation: bool = True,
                    precision=jax.lax.Precision.DEFAULT,
                    phi=None):
    """Offset-and-sum over (s, g) units via per-frequency contraction.

    Drop-in equivalent of xla_engine.aggregate_forward (same zero-padded
    bilinear-shift semantics, exact up to roundoff).

    Args:
      x_blur: (N, S, H, W) pre-blurred input.
      w, mu1, mu2: (S, G, F) unit parameters (w already dummy-masked).
      phi: optional prebuilt (phire, phiim) bin-major phase table.

    Returns: (N, F, H, W).
    """
    n, s, h, wd = x_blur.shape
    p1, p2, rb = plan_bins(h, wd, ks)
    dtype = x_blur.dtype
    if phi is None:
        phi = build_phi(w.astype(dtype), mu1, mu2, p1, p2, rb,
                        use_interpolation)
    return fourier_apply_phi(x_blur, phi[0], phi[1], h, wd, p1, p2, rb,
                             precision)


def fourier_input_grad(gy_blur, phi, ks: int,
                       precision=jax.lax.Precision.DEFAULT):
    """Input gradient from the (mirror-)blurred error and the FORWARD Phi:
    Phi(-mu, S<->F) = conj(Phi) with the contraction over F (reference
    identity base_dau_conv_layer.cu:294-325 in the spectral domain).

    gy_blur: (N, F, H, W) -> (N, S, H, W).
    """
    n, f, h, wd = gy_blur.shape
    p1, p2, rb = plan_bins(h, wd, ks)
    return fourier_apply_phi(gy_blur, phi[0], phi[1], h, wd, p1, p2, rb,
                             precision, contract_f=True)


def fourier_cross_spectra(x_blur_k, err, ks: int,
                          precision=jax.lax.Precision.DEFAULT):
    """Cross-spectra That[k] = sum_n X[k] conj(E[k]) as (tre, tim), each
    (B, M, S, F), plus the bin plan. Shared front half of
    `fourier_grad_tables` / `fourier_unit_grads`."""
    m, n, s, h, wd = x_blur_k.shape
    p1, p2, rb = plan_bins(h, wd, ks)
    dtype = x_blur_k.dtype
    spec_dtype = jnp.float32 if precision == jax.lax.Precision.HIGHEST else dtype

    xre, xim = _rdft2(x_blur_k, p1, p2, rb, precision)      # (M,N,S,B)
    # Stack re/im along N: Re(X * conj(E)) = Xre*Ere + Xim*Eim and
    # Im(X * conj(E)) = Xim*Ere - Xre*Eim are single K=2N contractions.
    xs = jnp.concatenate([xre, xim], axis=1)                 # (M,2N,S,B)
    es_re, es_im = _err_spectrum_stacked(err, p1, p2, rb, precision)
    dn = (((1,), (0,)), ((3,), (2,)))  # contract 2N in place, batch B

    def mm(a, b):
        return jax.lax.dot_general(a, b, dn, precision=precision,
                                   preferred_element_type=jnp.float32)

    tre = mm(xs, es_re).astype(spec_dtype)                   # (B,M,S,F)
    tim = mm(xs, es_im).astype(spec_dtype)
    return tre, tim, (p1, p2, rb)


def _err_spectrum_stacked(err, p1, p2, rb, precision):
    """Error spectrum with re/im stacked along N (see fourier_cross_spectra):
    (es_re, es_im), each (2N, F, B)."""
    ere, eim = _rdft2(err, p1, p2, rb, precision)           # (N,F,B)
    return (jnp.concatenate([ere, eim], axis=0),
            jnp.concatenate([-eim, ere], axis=0))


def _spectral_gather(tre, tim, mu1, mu2, p1, p2, rb, use_interpolation,
                     phase_span=None,
                     precision=jax.lax.Precision.DEFAULT):
    """grad[m,s,g,f] = sum_k coef_k (Re(phi_unit) tre - Im(phi_unit) tim)
    over cross-spectra (B, M, S, F) - the tap-gather in the spectral
    domain (the tap-weighted sum of inverse-DFT factors IS the unit's
    phase factor). phase_span: see `build_phi`."""
    b, m, s, f = tre.shape
    dtype = tre.dtype
    if phase_span is not None:
        pyre, pyim = _tap_phase_tables(mu2, p1, p1, use_interpolation, dtype,
                                       phase_span, precision)  # (P1,S,G,F)
        pxre, pxim = _tap_phase_tables(mu1, p2, rb, use_interpolation, dtype,
                                       phase_span, precision)  # (rb,S,G,F)
    else:
        pyre, pyim = _tap_phase(mu2, p1, p1, use_interpolation, dtype,
                                bin_leading=True)   # (P1,S,G,F)
        pxre, pxim = _tap_phase(mu1, p2, rb, use_interpolation, dtype,
                                bin_leading=True)   # (rb,S,G,F)
    w2 = np.full(rb, 2.0)
    w2[0] = 1.0
    if p2 % 2 == 0:
        w2[-1] = 1.0
    coef = jnp.asarray(w2 / (p1 * p2), dtype)

    tre5 = tre.reshape(p1, rb, m, s, 1, f)
    tim5 = tim.reshape(p1, rb, m, s, 1, f)
    yre = pyre[:, None, None, :, :, :]
    yim = pyim[:, None, None, :, :, :]
    xre = (pxre * coef[:, None, None, None])[None, :, None, :, :, :]
    xim = (pxim * coef[:, None, None, None])[None, :, None, :, :, :]
    # Re(phi) = yre*xre - yim*xim ; Im(phi) = yre*xim + yim*xre
    contrib = (tre5 * (yre * xre - yim * xim)
               - tim5 * (yre * xim + yim * xre))
    return jnp.sum(contrib.astype(jnp.float32), axis=(0, 1))


def fourier_unit_grads(x_blur_k, err, mu1, mu2, ks: int,
                       use_interpolation: bool = True,
                       precision=jax.lax.Precision.DEFAULT,
                       phase_tables: bool = True):
    """Per-unit parameter gradients WITHOUT materializing the position table:
    cross-spectra + the tap-gather applied in the spectral domain
    (_spectral_gather). One fused broadcast-reduce over the bins replaces
    the partial-iDFT matmul + one-hot tap-gather pair.

    Args:
      x_blur_k: (M, N, S, H, W) derivative-blurred inputs.
      err: (N, F, H, W) back-propagated error.
      phase_tables: use integer cos/sin tables for the unit phase factors
        (no runtime transcendentals; see `_tap_phase_tables`).

    Returns: (M, S, G, F) float32 (same contract as tap_gather over
    grad_tables output).
    """
    tre, tim, (p1, p2, rb) = fourier_cross_spectra(x_blur_k, err, ks,
                                                   precision)
    return _spectral_gather(tre, tim, mu1, mu2, p1, p2, rb,
                            use_interpolation,
                            phase_span=(ks // 2 + 1) if phase_tables else None,
                            precision=precision)


def fused_plan_info(h: int, w: int, ks: int, *, n: int, s: int, f: int,
                    g: int, m: int = 3, itemsize: int = 2,
                    has_dx: bool = False, gather: str = "phi",
                    interpret: bool = False,
                    vmem_budget: int | None = None):
    """Shape-only introspection of the fused backward's grid/VMEM plan at a
    layer shape (no device work, no tracing): derives the kernel-call
    operand dims exactly as `fourier_unit_grads_fused2` would and returns
    the plan dict from kernels.fused_bwd.{spectral,factored}_plan (plus
    'bins'). Lets tests pin production-shape plans off-chip - an
    accidental multi-chunk regression (e.g. a VMEM-budget or scratch-size
    change pushing AlexNet conv4 into 27 grid steps) shows up as a plan
    diff, not a mystery slowdown on the chip. itemsize: 2 = bf16
    (production), 4 = f32."""
    from ..kernels.fused_bwd import factored_plan, spectral_plan

    p1, p2, rb = plan_bins(h, w, ks)
    span = ks // 2 + 1
    nj = 2 * span + 2
    plan_fn = {"phi": spectral_plan, "factored": factored_plan}[gather]
    plan = plan_fn(m=m, n2=2 * n, s=s, f=f, nj=nj, g=g, p1b=p1, rbb=rb,
                   itemsize=itemsize, has_dx=has_dx, interpret=interpret,
                   vmem_budget=vmem_budget)
    plan["bins"] = p1 * rb
    return plan


def fourier_unit_grads_fused2(x_blur_k, err, mu1, mu2, ks: int,
                              use_interpolation: bool = True,
                              precision=jax.lax.Precision.DEFAULT,
                              err_blur=None, w_units=None,
                              gather: str = "phi"):
    """`fourier_unit_grads` with the cross-spectra AND the spectral
    tap-gather fused in one Pallas kernel (kernels/fused_bwd.py): the
    cross-spectra never touch HBM, the unit phase factors are built
    in-kernel from integer tables, and the bin reduction is a ones-row
    MXU dot. Same contract: (M, S, G, F) float32.

    err_blur + w_units additionally fuse the INPUT GRADIENT into the same
    kernel invocation (the unit phase factors are already in VMEM for the
    gather; dx costs one extra f-contraction per step instead of a separate
    HBM phi read + per-bin matmul chain):
      err_blur: (N, F, H, W) mirror-blurred error (the dx operand).
      w_units: (S, G, F) dummy-masked unit weights.
    Returns (grads, dx) with dx (N, S, H, W) float32.

    gather: 'phi' (default, production) builds each unit's phase factor
    over all bins; 'factored' contracts the cross-spectra against the
    integer-exponent tables once and combines per unit over the nj^2 table
    square - bin-independent per-unit work, but its skinny table dots are
    fill/drain-bound at the B<=256 shapes (kernels/fused_bwd.py).
    """
    from ..kernels.fused_bwd import fused_spectral_grads_call

    m, n, s, h, wd = x_blur_k.shape
    p1, p2, rb = plan_bins(h, wd, ks)
    span = ks // 2 + 1
    with_dx = err_blur is not None

    xre, xim = _rdft2(x_blur_k, p1, p2, rb, precision)       # (M,N,S,B)
    xs = jnp.concatenate([xre, xim], axis=1)                 # (M,2N,S,B)
    xs = jnp.transpose(xs, (3, 0, 1, 2))                     # (B,M,2N,S)
    ere, eim = _rdft2(err, p1, p2, rb, precision)            # (N,F,B)
    es = jnp.concatenate([ere, eim], axis=0)                 # (2N,F,B)
    es = jnp.transpose(es, (2, 0, 1))                        # (B,2N,F)
    esb = wg = None
    if with_dx:
        ebre, ebim = _rdft2(err_blur, p1, p2, rb, precision)
        esb = jnp.transpose(jnp.concatenate([ebre, ebim], axis=0), (2, 0, 1))
        wg = jnp.transpose(w_units, (1, 0, 2))               # (G,S,F)

    t1 = jnp.asarray(_phase_table_host(p1, p1, span), jnp.float32)
    w2 = np.full(rb, 2.0)
    w2[0] = 1.0
    if p2 % 2 == 0:
        w2[-1] = 1.0
    coef = np.concatenate([w2, w2])[:, None] / (p1 * p2)
    t2 = jnp.asarray(_phase_table_host(p2, rb, span) * coef, jnp.float32)
    a1 = jnp.transpose(_phase_onehot(mu1, span, use_interpolation),
                       (0, 2, 1, 3))                         # (nj,G,S,F)
    a2 = jnp.transpose(_phase_onehot(mu2, span, use_interpolation),
                       (0, 2, 1, 3))
    res = fused_spectral_grads_call(
        xs.astype(x_blur_k.dtype), es.astype(x_blur_k.dtype), t1, t2, a1, a2,
        n_img=n, p1b=p1, rbb=rb, esb=esb, wg=wg, gather=gather)
    if not with_dx:
        return res
    grads, dxs = res
    # dx spectra rows are [dXre; dXim]; the kernel's t2 already carries the
    # rfft coefficient, so the closing partial iDFT is RAW (apply_coef=False)
    dx = _spectra_to_image(dxs[:, :n], dxs[:, n:], p1, p2, rb, h, wd,
                           precision, apply_coef=False)
    return grads, dx


def fourier_grad_tables(x_blur_k, err, ks: int,
                        precision=jax.lax.Precision.DEFAULT):
    """Position table T[m,s,f,ky,kx] = sum_{n,ij} xbk[m,n,s,ij+p] err[n,f,ij]
    via cross-spectra - drop-in equivalent of xla_engine.grad_tables
    (measured ~3x faster at AlexNet conv4, ~5x at conv2).

    Layout discipline (each of these measured 3-13x slowdowns when violated,
    benchmarks/fourier_parts*.py):
    - the cross-spectrum contraction keeps every dim IN PLACE (batch = the
      trailing bin axis, contraction = the N axis where it lies) and stacks
      re/im along N so the per-bin matmul contracts K=2N, not two K=N halves;
    - the partial iDFT consumes the (B, M, S, F) cross-spectrum K-MAJOR as
      the rhs of dot(D^T, That) - never transposed;
    - the table is returned POSITION-MAJOR (ks*ks leading) because that is
      the layout this pipeline produces for free; xla_engine.tap_gather
      accepts it via table_layout="pmsf".

    Args:
      x_blur_k: (M, N, S, H, W) derivative-blurred inputs.
      err: (N, F, H, W).

    Returns: (ks*ks, M, S, F) float32 position-major table.
    """
    m, n, s, h, wd = x_blur_k.shape
    f = err.shape[1]
    c = ks // 2
    tre, tim, (p1, p2, rb) = fourier_cross_spectra(x_blur_k, err, ks,
                                                   precision)
    spec_dtype = tre.dtype

    pos = np.arange(-c, c + 1)
    cmat, smat = _idft_mats(p1, p2, rb, pos, pos, spec_dtype)
    # T[p, m, s, f] = sum_k C[k,p] tre[k,...] - S[k,p] tim[k,...]: a plain
    # (81, B) x (B, M*S*F) matmul that XLA runs pathologically slowly in
    # every layout (benchmarks/fourier_parts4.py); Pallas chunked matmul
    # runs it at HBM bandwidth.
    from ..kernels.spectral import partial_idft
    table = partial_idft(cmat, smat, tre.reshape(p1 * rb, -1),
                         tim.reshape(p1 * rb, -1), out_dtype=spec_dtype)
    return table.reshape(ks * ks, m, s, f)


def _fused_idft_mats(p1, p2, rb, h, wd):
    """(HWp, B) partial-iDFT cos/sin matrices for the fused fwd kernel
    (rows 8-padded; rfft coefficient folded)."""
    cmat, smat = _idft_mats(p1, p2, rb, np.arange(h), np.arange(wd),
                            jnp.float32)
    hw = h * wd
    hwp = -(-hw // 8) * 8
    dct = jnp.pad(cmat.T, ((0, hwp - hw), (0, 0)))
    dst = jnp.pad(smat.T, ((0, hwp - hw), (0, 0)))
    return dct, dst, hwp


def fourier_apply_phi_fused(x_blur, w, mu1, mu2, ks: int,
                            use_interpolation: bool = True,
                            precision=jax.lax.Precision.DEFAULT,
                            contract_f: bool = False):
    """`fourier_forward` (contract_f=False) or the input gradient
    (contract_f=True, x_blur = mirror-blurred error) with Phi built
    in-kernel and the per-bin matmuls + partial iDFT fused in one Pallas
    pass (kernels/fused_fwd.py): Phi and the Y spectra never touch HBM.

    w, mu1, mu2: (S, G, F). Returns (N, F, H, W) - or (N, S, H, W) for
    the input-gradient direction.
    """
    from ..kernels.fused_fwd import fused_apply_phi_call

    n, cin, h, wd = x_blur.shape
    p1, p2, rb = plan_bins(h, wd, ks)
    span = ks // 2 + 1
    dtype = x_blur.dtype

    xre, xim = _rdft2(x_blur, p1, p2, rb, precision)     # (N,CI,B)
    xs = jnp.concatenate([xre, xim], axis=0)             # (2N,CI,B)
    xs = jnp.transpose(xs, (2, 0, 1))                    # (B,2N,CI)

    t1 = np.asarray(_phase_table_host(p1, p1, span))
    t2 = np.asarray(_phase_table_host(p2, rb, span))
    if contract_f:
        # conj(Phi): negate the sin halves of both 1D factor tables
        t1[p1:] = -t1[p1:]
        t2[rb:] = -t2[rb:]
    t1 = jnp.asarray(t1, jnp.float32)
    t2 = jnp.asarray(t2, jnp.float32)

    a2 = _phase_onehot(mu2, span, use_interpolation)     # (nj,S,G,F)
    aw = a2 * w.astype(jnp.float32)[None]
    a1 = _phase_onehot(mu1, span, use_interpolation)
    if contract_f:
        aw = jnp.transpose(aw, (0, 2, 3, 1))             # (nj,G,F,S)
        a1 = jnp.transpose(a1, (0, 2, 3, 1))
    else:
        aw = jnp.transpose(aw, (0, 2, 1, 3))             # (nj,G,S,F)
        a1 = jnp.transpose(a1, (0, 2, 1, 3))

    dct, dst, hwp = _fused_idft_mats(p1, p2, rb, h, wd)
    out = fused_apply_phi_call(
        xs.astype(dtype), t1, t2, aw.astype(dtype), a1.astype(dtype),
        dct, dst, n_img=n, p1b=p1, rbb=rb)               # (HWp,N,CO)
    co = out.shape[2]
    y = jnp.transpose(out[:h * wd], (1, 2, 0)).reshape(n, co, h, wd)
    return y.astype(dtype)
