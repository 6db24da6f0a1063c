"""Fused Pallas backward: cross-spectra + spectral tap-gather in one kernel.

The fourier engine's parameter-gradient path is mathematically
(fourier_engine.py):

    T[k,m,s,f]    = sum_n X[k,m,n,s] * conj(E)[k,n,f]     (per-bin matmuls)
    grad[m,s,g,f] = sum_k Re(phiU[k,s,g,f] * T[k,m,s,f])  (spectral gather)

Run separately in XLA, the chain is HBM-bound on the cross-spectra
intermediate: T is B*M*S*F complex (~270 MB bf16 at AlexNet conv4),
written once and re-read once. This kernel keeps T entirely in VMEM per
(S, F) block - the only HBM traffic is the input spectra (~30 MB) and the
(M, S, G, F) gradient output. Measured at AlexNet shapes (bf16, v5e):
conv3 0.71 vs 0.79 ms unfused, conv4 0.84 vs 1.37, conv5 0.76 vs 0.74,
conv2 (B=496 bins) 0.94 vs 0.58 - the op gates on bin count accordingly.

This is the TPU analogue of the reference's fused backward mega-kernel
(`DAUConv_bwd_multi_pipeline_kernel`, dau_conv_backward_core.hpp:1019-2119,
which also computes per-position correlations and per-unit reductions in
one on-chip pass) - but organized around the MXU: the per-bin cross
products are batched matmuls, the unit phase factors come from integer
cos/sin tables via skinny 3D dots, and the bin reduction is a ones-row
MXU dot.

Empirical Mosaic facts this design rests on (benchmarks/mosaic_probe.py +
measured failures recorded in PERF_NOTES.md, v5e):
- 3D dot_general (P,K)x(K,A,B) compiles and is correct; *batched*
  dot_general beyond ~16 batch does NOT compile in practical time - hence
  the fori_loop of rb-batch dots for the per-bin stage.
- NO reduction over the implicit (leading) dim of a >2D vector exists; a
  p-indexed fori_loop of small slabs is latency-bound (1.6 ms); the
  position-table variant of this kernel (tree-reduce over 81 positions)
  reached only 1.9 ms - reducing via a ones-row dot is the fast path.
- f32 gather temporaries beat bf16 (bf16 elementwise pays pack/unpack:
  0.98 -> 2.36 ms regression).
- Dynamic sublane slice starts must be provably 8-aligned (k1 chunks are
  multiples of 8; single-chunk loads the whole table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedPlanError", "fused_spectral_grads_call",
           "spectral_plan", "factored_plan"]


class FusedPlanError(ValueError):
    """No fused-kernel plan exists for this shape (VMEM won't fit or a block
    constraint fails); callers fall back to the unfused XLA path. A dedicated
    type so the fallback catch cannot mask genuine contract bugs (which stay
    plain ValueError)."""


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# v2: cross-spectra + SPECTRAL tap-gather in one kernel (no position table).
#
# grad[m,s,g,f] = sum_k Re(phiU[k,s,g,f]) * Tre[k,m,s,f]
#                       - Im(phiU) * Tim[k,m,s,f]
# where phiU = py(mu2)[k1] * px(mu1)[k2] is the unit's phase factor with the
# rfft conjugate-half coefficient folded into px's table. The phase factors
# are built IN-KERNEL from integer cos/sin tables via the one Mosaic-
# supported 3D dot form (P, K) x (K, A, B); the bin reduction is a
# ones-row 3D dot on the MXU - no implicit-dim reductions anywhere (the
# failure mode that made the v1 position-table gather 1.2 ms at conv4).
#
# Measured notes (v5e, AlexNet conv4): f32 gather temporaries - bf16
# phiU/Z REGRESSED 0.98 -> 2.36 ms (VPU bf16 elementwise pays pack/unpack,
# and the temps are VMEM-resident anyway). Bins are chunked by k1 rows
# (kb_c = k1_blk * rb) so large-B shapes (conv2: B=496) fit VMEM; the
# cross-stage dot batch is exactly rb per group, so kb needs no padding.
# ---------------------------------------------------------------------------


def _kernel_spectral(*refs, n_img: int, m_filt: int, rbb: int, k1_blk: int,
                     g_units: int, hi_precision: bool, has_dx: bool):
    """One (s_blk, k1-chunk, f_blk) grid step.

    xs_ref:  (kb_c, M, 2N, s_blk) input spectra (re/im stacked along 2N)
    es_ref:  (kb_c, 2N, f_blk)    error spectra [Ere; Eim]
    esb_ref: (kb_c, 2N, f_blk)    blurred-error spectra (dx operand, has_dx)
    wg_ref:  (G, s_blk, f_blk)    unit weights (has_dx)
    t1c/t1s: (p1_pad, nj)         axis-1 cos / sin tables (full; sliced by
                                  chunk in-kernel - a (k1_blk, nj) block
                                  would violate the (8,128) block rule)
    t2_ref:  (2*rb, nj)           axis-2 [cos; sin] table, rfft coef folded
    a1/a2:   (G, nj, s_blk, f_blk) bilinear one-hot exponent weights
    out:     (1, M, G, s_blk, f_blk) f32 per-k1-chunk PARTIAL (summed by the
             caller): each grid step owns a distinct block, so the dx output
             can take the consecutive-revisit slot of the fj dim instead. G
             sits on an UNTILED dim so the per-unit loop can index it
             dynamically (no sublane-alignment proof needed).
    out2:    (kb_c, 2N, s_blk) f32 input-grad spectra [dXre; dXim] (has_dx),
             accumulated across the fj grid dim (innermost => the revisits
             are consecutive and the block stays VMEM-resident) AND across
             the per-unit loop (directly: a g-summed (kb_c, s_blk, f_blk)
             w*phi scratch pair would cost 2x10 MB of f32 VMEM, which
             pushed conv4 off the single-chunk plan into 27 grid steps).
    scratch: tre/tim (kb_c, M*s_blk, f_blk).

    MEASURED NEGATIVE (round 3, v5e): lane-stacking [tre | tim] into one
    scratch (one dot per (k-group, m) against a concatenated
    [E | rotated-E] rhs, and a [phire | -phiim] concat in the gather)
    REGRESSED conv4 0.84 -> 1.76 ms: the in-kernel concats are real VMEM
    copies (~20 MB/unit/step for the phi pair) and cost far more than the
    halved dot dispatches save. Operands are therefore kept separate and
    read in place everywhere below.

    has_dx additionally emits the INPUT-GRADIENT spectra from the same
    in-VMEM phase factors: dX[k,n,s] = sum_{g,f} conj(phiU)*w * Eblur[k,n,f]
    - the phase build (the dominant gather cost) is amortized over both
    outputs, and the dx path needs no HBM phi table at all.

    The per-unit gather loop is Python-unrolled for G <= 2 (static loads,
    the measured round-2 configuration) and a lax.fori_loop with
    dynamic-index loads for larger G: the round-2 kernel unrolled G
    unconditionally and its Mosaic IR grew until the remote compile helper
    was OOM-killed at G=4 (the AlexNet-DAU-large shape) - the fori body
    keeps the IR constant in G.
    """
    if has_dx:
        (xs_ref, es_ref, esb_ref, wg_ref, t1c_ref, t1s_ref, t2_ref, a1_ref,
         a2_ref, out_ref, out2_ref, tre_buf, tim_buf,
         pyre_buf, pyim_buf) = refs
    else:
        (xs_ref, es_ref, t1c_ref, t1s_ref, t2_ref, a1_ref, a2_ref,
         out_ref, tre_buf, tim_buf) = refs
    kc = pl.program_id(1)
    fj = pl.program_id(2)
    s_blk = a1_ref.shape[2]
    f_blk = a1_ref.shape[3]
    kb_c = k1_blk * rbb
    cdt = xs_ref.dtype
    dnb = (((1,), (1,)), ((0,), (0,)))
    dnf = (((2,), (2,)), ((0,), (0,)))
    dn1 = (((1,), (0,)), ((), ()))
    # Mosaic's f32 dot_general defaults to a truncated-precision pass:
    # without HIGHEST, the compiled kernel's gradients came out with
    # bf16-class (~1e-2) error in the f32 oracle mode while interpret
    # mode was exact (caught by benchmarks/tpu_oracle_check.py).
    prec = (jax.lax.Precision.HIGHEST if hi_precision
            else jax.lax.Precision.DEFAULT)

    def dot(a, b, dn):
        return jax.lax.dot_general(a, b, dn, precision=prec,
                                   preferred_element_type=jnp.float32)

    def cross_body(i, carry):
        k0 = i * rbb
        xsg = xs_ref[pl.ds(k0, rbb)]
        esg = es_ref[pl.ds(k0, rbb)]
        for mi in range(m_filt):
            lhs = xsg[:, mi]
            lhs_im = jnp.concatenate(
                [lhs[:, n_img:], -lhs[:, :n_img]], axis=1)
            sl = slice(mi * s_blk, (mi + 1) * s_blk)
            tre_buf[pl.ds(k0, rbb), sl] = dot(lhs, esg, dnb).astype(cdt)
            tim_buf[pl.ds(k0, rbb), sl] = dot(lhs_im, esg, dnb).astype(cdt)
        return carry

    jax.lax.fori_loop(0, k1_blk, cross_body, 0, unroll=False)

    ones = jnp.ones((1, kb_c), jnp.float32)
    if t1c_ref.shape[0] == k1_blk:
        # single chunk: whole-table load (a dynamic 0 start is not
        # provably 8-aligned to Mosaic)
        t1c = t1c_ref[...]
        t1s = t1s_ref[...]
    else:
        # multi-chunk: k1_blk is a multiple of 8 by plan, so the slice
        # start kc * k1_blk is provably sublane-aligned
        t1c = t1c_ref[pl.ds(kc * k1_blk, k1_blk)]
        t1s = t1s_ref[pl.ds(kc * k1_blk, k1_blk)]

    def gather_unit(gi):
        a1g = a1_ref[gi]                          # (nj, s_blk, f_blk)
        a2g = a2_ref[gi]
        pyre = dot(t1c, a2g, dn1)
        pyim = dot(t1s, a2g, dn1)
        px = dot(t2_ref[...], a1g, dn1)
        pxre, pxim = px[:rbb], px[rbb:]
        # unit phase factor over this chunk's bins, k = k1*rb + k2
        # (leading-dim outer product + merge: implicit reshape, no relayout)
        phire = (pyre[:, None] * pxre[None] - pyim[:, None] * pxim[None]
                 ).reshape(kb_c, s_blk, f_blk)
        phiim = (pyre[:, None] * pxim[None] + pyim[:, None] * pxre[None]
                 ).reshape(kb_c, s_blk, f_blk)
        if has_dx:
            # input-grad spectra from THIS unit's conj(phi)*w factor,
            # accumulated straight into out2:
            #   dX += w*(phi_re - i phi_im) (Ebre + i Ebim), f-contracted.
            # Per k-group: o1 = Eb @ (w*phi_re)^T, o2 = Eb @ (w*phi_im)^T;
            # dXre = o1[:n] + o2[n:], dXim = o1[n:] - o2[:n].
            # A k-group is exactly one k1 row (k = k1*rb + k2), so the
            # group's phi rows are rebuilt from that row's py factor and the
            # (whole, static) px factors - Mosaic has NO dynamic_slice on
            # VALUES, so slicing the pre-built phi by traced k0 does not
            # lower; the py rows go through a small scratch ref instead
            # (leading-dim ref slices are untiled and always legal). The
            # rebuild costs 4 VPU FMA passes over the group (~0.5% of the
            # dx dot's MACs).
            wgi = wg_ref[gi].astype(jnp.float32)  # (s_blk, f_blk)
            static_g = gi if isinstance(gi, int) else None
            pyre_buf[...] = pyre
            pyim_buf[...] = pyim

            def dx_body(i, carry):
                k0 = i * rbb
                ebg = esb_ref[pl.ds(k0, rbb)].astype(jnp.float32)
                pyr = pyre_buf[pl.ds(i, 1)]       # (1, s_blk, f_blk)
                pyi = pyim_buf[pl.ds(i, 1)]
                prg = (pyr * pxre - pyi * pxim) * wgi[None]
                pig = (pyr * pxim + pyi * pxre) * wgi[None]
                o1 = dot(ebg, prg, dnf)           # (rbb, 2N, s_blk)
                o2 = dot(ebg, pig, dnf)
                v = jnp.concatenate(
                    [o1[:, :n_img] + o2[:, n_img:],
                     o1[:, n_img:] - o2[:, :n_img]], axis=1)
                if static_g == 0:
                    @pl.when(fj == 0)
                    def _():
                        out2_ref[pl.ds(k0, rbb)] = v

                    @pl.when(fj > 0)
                    def _():
                        out2_ref[pl.ds(k0, rbb)] = out2_ref[pl.ds(k0, rbb)] + v
                elif static_g is not None:        # unrolled, later unit
                    out2_ref[pl.ds(k0, rbb)] = out2_ref[pl.ds(k0, rbb)] + v
                else:                             # fori path: traced gi
                    init = (fj == 0) & (gi == 0)

                    @pl.when(init)
                    def _():
                        out2_ref[pl.ds(k0, rbb)] = v

                    @pl.when(jnp.logical_not(init))
                    def _():
                        out2_ref[pl.ds(k0, rbb)] = out2_ref[pl.ds(k0, rbb)] + v
                return carry

            jax.lax.fori_loop(0, k1_blk, dx_body, 0, unroll=False)
        for mi in range(m_filt):
            sl = slice(mi * s_blk, (mi + 1) * s_blk)
            z = (phire * tre_buf[:, sl].astype(jnp.float32)
                 - phiim * tim_buf[:, sl].astype(jnp.float32))
            out_ref[0, mi, gi] = dot(ones, z, dn1)[0]

    if g_units <= 2:
        for gi in range(g_units):
            gather_unit(gi)
    else:
        def g_body(gi, carry):
            gather_unit(gi)
            return carry

        jax.lax.fori_loop(0, g_units, g_body, 0, unroll=False)


# ---------------------------------------------------------------------------
# v6: FACTORED spectral gather - contract the cross-spectra against the
# integer-exponent tables once, combine per unit with its one-hot taps.
#
# The v2/v5 gather builds each unit's phase factor phiU over all B bins
# (4 VPU merge passes + 2 z passes, each B*s_blk*f_blk, per unit per m):
# VPU work scales with B*G and dominated the kernel at conv2 (B=496,
# 0.94 vs 0.58 ms unfused). But phiU itself factors through the tables:
#     phi_re[k] = sum_{j1,j2} t1c[k1,j1] t2c[k2,j2] a2[j1] a1[j2] - ...
# so the bin reduction can be done ONCE against the tables, independent of
# the units:
#     P[k1,j2] = t2c^T Tre[k1,:] - t2s^T Tim[k1,:]     (k2 contraction)
#     Q[k1,j2] = t2s^T Tre[k1,:] + t2c^T Tim[k1,:]
#     E[j1,j2] = t1c^T P - t1s^T Q                      (k1 contraction)
#     grad[g]  = sum_{j1,j2} a2[g,j1] a1[g,j2] E[j1,j2] (per-unit combine)
# All bin-scaled work is now MXU dots of size ~B*nj (nj = ks+3), and the
# per-unit work is nj^2 VPU passes - INDEPENDENT of B. The t2 table carries
# the rfft conjugate-half coefficient and 1/(P1*P2), so E needs no closing
# normalization.
#
# Grid is (si, fj, kc) with the chunk dim INNERMOST (the opposite of v5):
# E accumulates across k1 chunks in scratch per (si, fj), and the dx output
# block (full-B rows, indexed by si alone) accumulates across both fj and
# kc - consecutive revisits either way.
# ---------------------------------------------------------------------------


def _kernel_factored(*refs, n_img: int, m_filt: int, rbb: int, k1_blk: int,
                     n_k1: int, g_units: int, c_blk: int, hi_precision: bool,
                     has_dx: bool):
    """One (si, fj, kc) grid step of the factored-gather backward.

    xs/es/esb/wg/out/out2/tre/tim: as in _kernel_spectral (but out has NO
    per-chunk partial dim and out2 is the full-B block for this si).
    t2cT/t2sT: (nj, rb) pre-transposed axis-2 tables (coef folded; used for
      the <c_blk remainder k1 rows).
    t2cblk/t2sblk: (nj*C, C*rb) block-diagonal axis-2 tables - C k1 rows'
      k2-contractions batched into ONE MXU dot (rows (j2, c)-major, cols
      (c, k2)-major). The per-row form was fill/drain-bound: 204 skinny
      (nj, rb) dots per grid step at conv4 cost ~0.6 ms over the phi
      gather (PERF_NOTES round 3).
    t1cblk/t1sblk: (1, nj*nj, nj*k1_blk) kc-chunked block-diagonal axis-1
      tables - the whole E stage is ONE dot per (m, cos/sin) against the
      flattened (nj*k1_blk, s_blk, f_blk) P/Q scratch (rows (j2, k1)-major,
      matching the table's cols; the flatten merges two UNTILED leading
      dims, a layout no-op).
    t1c/t1s (p1_pad, nj) + t2 (2rb, nj): only with has_dx (py/px factors).
    p_buf/q_buf: (nj, k1_blk, s_blk, f_blk) per-m k2-contracted spectra,
      (j2, k1)-major.
    e_buf: (m or 1, nj, nj, s_blk, f_blk) f32 E accumulator; single-chunk
      plans keep only one m slot (combine runs inside the m loop).
    """
    if has_dx:
        (xs_ref, es_ref, esb_ref, wg_ref, t2cT_ref, t2sT_ref,
         t2cblk_ref, t2sblk_ref, t1cblk_ref, t1sblk_ref,
         t1c_ref, t1s_ref, t2_ref, a1_ref, a2_ref,
         out_ref, out2_ref, tre_buf, tim_buf, p_buf, q_buf, e_buf,
         pyre_buf, pyim_buf) = refs
    else:
        (xs_ref, es_ref, t2cT_ref, t2sT_ref,
         t2cblk_ref, t2sblk_ref, t1cblk_ref, t1sblk_ref,
         a1_ref, a2_ref, out_ref, tre_buf, tim_buf, p_buf, q_buf,
         e_buf) = refs
    fj = pl.program_id(1)
    kc = pl.program_id(2)
    s_blk = a1_ref.shape[2]
    f_blk = a1_ref.shape[3]
    kb_c = k1_blk * rbb
    cdt = xs_ref.dtype
    nj = t2cT_ref.shape[0]
    dnb = (((1,), (1,)), ((0,), (0,)))
    dn1 = (((1,), (0,)), ((), ()))
    prec = (jax.lax.Precision.HIGHEST if hi_precision
            else jax.lax.Precision.DEFAULT)

    def dot(a, b, dn):
        return jax.lax.dot_general(a, b, dn, precision=prec,
                                   preferred_element_type=jnp.float32)

    def cross_body(i, carry):
        k0 = i * rbb
        xsg = xs_ref[pl.ds(k0, rbb)]
        esg = es_ref[pl.ds(k0, rbb)]
        for mi in range(m_filt):
            lhs = xsg[:, mi]
            lhs_im = jnp.concatenate(
                [lhs[:, n_img:], -lhs[:, :n_img]], axis=1)
            sl = slice(mi * s_blk, (mi + 1) * s_blk)
            tre_buf[pl.ds(k0, rbb), sl] = dot(lhs, esg, dnb).astype(cdt)
            tim_buf[pl.ds(k0, rbb), sl] = dot(lhs_im, esg, dnb).astype(cdt)
        return carry

    jax.lax.fori_loop(0, k1_blk, cross_body, 0, unroll=False)

    t2cT = t2cT_ref[...]                          # (nj, rb)
    t2sT = t2sT_ref[...]
    t2cblk = t2cblk_ref[...]                      # (nj*C, C*rb)
    t2sblk = t2sblk_ref[...]
    t1cblk = t1cblk_ref[0]                        # (nj*nj, nj*k1_blk)
    t1sblk = t1sblk_ref[0]
    single = n_k1 == 1
    n_full = k1_blk // c_blk

    def combine_m(mi, ev):
        """grad[g] = sum_{j1,j2} a2[g,j1] a1[g,j2] E[j1,j2] for one m
        (ev: the (nj, nj, s_blk, f_blk) E value, (j2, j1)-indexed)."""
        def unit(gi):
            a1g = a1_ref[gi].astype(jnp.float32)  # (nj, s_blk, f_blk)
            a2g = a2_ref[gi].astype(jnp.float32)
            acc = jnp.zeros((s_blk, f_blk), jnp.float32)
            for j1 in range(nj):
                inner = a1g[0] * ev[0, j1]
                for j2 in range(1, nj):
                    inner = inner + a1g[j2] * ev[j2, j1]
                acc = acc + a2g[j1] * inner
            out_ref[mi, gi] = acc

        if g_units <= 2:
            for gi in range(g_units):
                unit(gi)
        else:
            def g_body(gi, carry):
                unit(gi)
                return carry
            jax.lax.fori_loop(0, g_units, g_body, 0, unroll=False)

    for mi in range(m_filt):
        sl = slice(mi * s_blk, (mi + 1) * s_blk)

        # k2-contraction: C k1 rows per block-diagonal dot, the <C tail
        # via the per-row form (both write the (j2, k1)-major p/q scratch)
        for i in range(n_full):
            r0 = i * c_blk * rbb
            tr = tre_buf[pl.ds(r0, c_blk * rbb), sl]
            ti = tim_buf[pl.ds(r0, c_blk * rbb), sl]
            pc = dot(t2cblk, tr, dn1)             # (nj*C, s_blk, f_blk) f32
            ps = dot(t2sblk, tr, dn1)
            qc = dot(t2cblk, ti, dn1)
            qs = dot(t2sblk, ti, dn1)
            p_buf[:, pl.ds(i * c_blk, c_blk)] = (
                (pc - qs).reshape(nj, c_blk, s_blk, f_blk).astype(cdt))
            q_buf[:, pl.ds(i * c_blk, c_blk)] = (
                (ps + qc).reshape(nj, c_blk, s_blk, f_blk).astype(cdt))

        def row_body(i, carry):
            k0 = i * rbb
            tr = tre_buf[pl.ds(k0, rbb), sl]
            ti = tim_buf[pl.ds(k0, rbb), sl]
            pc = dot(t2cT, tr, dn1)               # (nj, s_blk, f_blk) f32
            ps = dot(t2sT, tr, dn1)
            qc = dot(t2cT, ti, dn1)
            qs = dot(t2sT, ti, dn1)
            p_buf[:, pl.ds(i, 1)] = (pc - qs)[:, None].astype(cdt)
            q_buf[:, pl.ds(i, 1)] = (ps + qc)[:, None].astype(cdt)
            return carry

        if n_full * c_blk < k1_blk:
            jax.lax.fori_loop(n_full * c_blk, k1_blk, row_body, 0,
                              unroll=False)

        # E stage: ONE dot per (cos/sin) against the flattened scratch
        pv = p_buf[...].reshape(nj * k1_blk, s_blk, f_blk)
        qv = q_buf[...].reshape(nj * k1_blk, s_blk, f_blk)
        e4 = (dot(t1cblk, pv, dn1)
              - dot(t1sblk, qv, dn1)).reshape(nj, nj, s_blk, f_blk)
        if single:
            # no accumulator: e4 feeds the combine directly
            combine_m(mi, e4)
        else:
            @pl.when(kc == 0)
            def _():
                e_buf[mi] = e4

            @pl.when(kc > 0)
            def _():
                e_buf[mi] = e_buf[mi] + e4

    if not single:
        @pl.when(kc == n_k1 - 1)
        def _():
            for mi in range(m_filt):
                combine_m(mi, e_buf[mi])

    if has_dx:
        # per-unit input-grad spectra, accumulated into the full-B out2
        # block: rows of THIS chunk are first written at (fj==0, unit 0)
        # and accumulated on every later visit (see _kernel_spectral dx
        # notes for the math).
        if t1c_ref.shape[0] == k1_blk:
            t1c = t1c_ref[...]
            t1s = t1s_ref[...]
        else:
            t1c = t1c_ref[pl.ds(kc * k1_blk, k1_blk)]
            t1s = t1s_ref[pl.ds(kc * k1_blk, k1_blk)]

        def dx_unit(gi):
            a1g = a1_ref[gi]
            a2g = a2_ref[gi]
            pyre_buf[...] = dot(t1c, a2g, dn1)
            pyim_buf[...] = dot(t1s, a2g, dn1)
            px = dot(t2_ref[...], a1g, dn1)
            pxre = px[:rbb]
            pxim = px[rbb:]
            wgi = wg_ref[gi].astype(jnp.float32)
            static_g = gi if isinstance(gi, int) else None

            def dx_body(i, carry):
                k0 = i * rbb
                row0 = kc * kb_c + k0
                ebg = esb_ref[pl.ds(k0, rbb)].astype(jnp.float32)
                pyr = pyre_buf[pl.ds(i, 1)]
                pyi = pyim_buf[pl.ds(i, 1)]
                prg = (pyr * pxre - pyi * pxim) * wgi[None]
                pig = (pyr * pxim + pyi * pxre) * wgi[None]
                dnf = (((2,), (2,)), ((0,), (0,)))
                o1 = dot(ebg, prg, dnf)           # (rbb, 2N, s_blk)
                o2 = dot(ebg, pig, dnf)
                v = jnp.concatenate(
                    [o1[:, :n_img] + o2[:, n_img:],
                     o1[:, n_img:] - o2[:, :n_img]], axis=1)
                first = ((fj == 0) if static_g == 0
                         else (fj == 0) & (gi == 0) if static_g is None
                         else None)
                if first is None:                 # unrolled, later unit
                    out2_ref[pl.ds(row0, rbb)] = (
                        out2_ref[pl.ds(row0, rbb)] + v)
                else:
                    @pl.when(first)
                    def _():
                        out2_ref[pl.ds(row0, rbb)] = v

                    @pl.when(jnp.logical_not(first))
                    def _():
                        out2_ref[pl.ds(row0, rbb)] = (
                            out2_ref[pl.ds(row0, rbb)] + v)
                return carry

            jax.lax.fori_loop(0, k1_blk, dx_body, 0, unroll=False)

        if g_units <= 2:
            for gi in range(g_units):
                dx_unit(gi)
        else:
            def gdx_body(gi, carry):
                dx_unit(gi)
                return carry
            jax.lax.fori_loop(0, g_units, gdx_body, 0, unroll=False)


def _block_shapes(f: int, s: int, interpret: bool):
    """Mosaic requires the LAST TWO dims of every block to be (8, 128)-
    divisible or equal to the array dims; and the LANE dim of the in-kernel
    3D dots (F here) must be a 128-multiple when compiled - F=32 dies in
    infer-vector-layout with an unsupported shape cast (reproduced on the
    reference-speedtest layer config). Interpret mode has no such
    constraint (small-shape tests)."""
    if f % 128 == 0:
        f_blk = 128
    elif interpret and f % 8 == 0 and f <= 512:
        f_blk = f
    else:
        raise FusedPlanError(f"fused_spectral_grads: unsupported F={f}")
    if s % 128 == 0:
        s_blk = 128
    elif s % 8 == 0 and s <= 512:
        s_blk = s
    else:
        raise FusedPlanError(f"fused_spectral_grads: unsupported S={s}")
    return f_blk, s_blk


def factored_plan(*, m: int, n2: int, s: int, f: int, nj: int, g: int,
                  p1b: int, rbb: int, itemsize: int, has_dx: bool,
                  interpret: bool, vmem_budget: int | None = None):
    """Host-side grid/VMEM plan of the factored-gather kernel (shape math
    only, no device work). Returns {k1_blk, n_k1, c_blk, s_blk, f_blk,
    single, vmem_budget}; raises FusedPlanError when no plan fits. Split
    out so tests/probes can pin production-shape plans off-chip."""
    f_blk, s_blk = _block_shapes(f, s, interpret)

    if vmem_budget is None:
        # mirror the phi path's dx headroom; the no-dx form also runs at
        # 112 MB (Mosaic's limit is 124) - the blocked P/Q dot temporaries
        # are worth more single-chunk room than the phi path needs
        vmem_budget = 112 * 1024 * 1024

    # C ceiling: the largest power of two whose live f32 P/Q block-dot
    # outputs (4 dots + 2 merges of (nj*C, s_blk, f_blk)) stay within a
    # third of the budget, and whose dot K dim (C*2rb stacked halves)
    # stays MXU-friendly.
    temp_cap = vmem_budget // 3
    c_cap = 1
    while (c_cap * 2 * rbb <= 256
           and 6 * nj * c_cap * 2 * s_blk * f_blk * 4 <= temp_cap):
        c_cap *= 2

    def blk_tmp_for(c):
        # peak transient set: max(P/Q stage: 4 dots + 2 merges of
        # (nj*C, s_blk, f_blk) f32, E stage: 2 dots + 1 merge of
        # (nj^2, s_blk, f_blk) f32)
        return max(6 * nj * c * s_blk * f_blk * 4,
                   3 * nj * nj * s_blk * f_blk * 4)

    def footprint(k1_blk, blk_tmp):
        kb_c = k1_blk * rbb
        single = k1_blk >= p1b
        p1p_ = _ceil_to(p1b, k1_blk)
        xs_b = 2 * kb_c * m * n2 * s_blk * itemsize
        es_b = 2 * kb_c * n2 * f_blk * itemsize
        t_b = 2 * kb_c * m * s_blk * f_blk * itemsize
        pq_b = 2 * nj * k1_blk * s_blk * f_blk * itemsize
        # single-chunk plans skip the E accumulator (e4 feeds the combine)
        e_b = 0 if single else m * nj * nj * s_blk * f_blk * 4
        row_b = max(6 * rbb * s_blk * f_blk * 4, blk_tmp)
        a_b = 4 * nj * g * s_blk * f_blk * itemsize
        total = xs_b + es_b + t_b + pq_b + e_b + row_b + a_b
        if has_dx:
            total += 2 * kb_c * n2 * f_blk * itemsize   # esb block (dbuf)
            total += p1p_ * rbb * n2 * s_blk * 4        # full-B dx block
            total += 2 * k1_blk * s_blk * f_blk * 4     # py scratch
            total += 5 * rbb * s_blk * f_blk * 4        # px / w*phi temps
        return total

    # Joint (chunks, C) search, fewest chunks first, then largest C: a
    # chunk multiplies the xs/es/table block traffic and the grid-step
    # overhead, while a narrower C only skinnies the P/Q dots - at AlexNet
    # conv4 the dx variant at C=8 missed the single-chunk plan by ~2 MB of
    # C-scaled dot temporaries and paid 3x the grid steps; C=4 fits.
    best = None  # (n_k1, -c, k1_blk)
    c = c_cap
    while c >= 1:
        bt = blk_tmp_for(c)
        cand = None
        if footprint(p1b, bt) <= vmem_budget:
            cand = (1, -c, p1b)
        else:
            # multi-chunk: k1_blk must be a multiple of 8 so the in-kernel
            # table slice start is provably sublane-aligned
            for n_k1_c in range(2, p1b + 1):
                k1c = _ceil_to(-(-p1b // n_k1_c), 8)
                if footprint(k1c, bt) <= vmem_budget:
                    cand = (-(-p1b // k1c), -c, k1c)
                    break
        if cand is not None and (best is None or cand < best):
            best = cand
        c //= 2
    if best is None:
        raise FusedPlanError(
            f"fused_factored: no VMEM plan for B={p1b * rbb} M={m} "
            f"S={s} F={f}")
    n_k1, neg_c, k1_blk = best
    c_blk = min(-neg_c, 1 << (k1_blk.bit_length() - 1))
    return dict(k1_blk=k1_blk, n_k1=n_k1, c_blk=c_blk, s_blk=s_blk,
                f_blk=f_blk, single=n_k1 == 1, vmem_budget=vmem_budget)


def _fused_factored_call(xs, es, t1, t2, a1, a2, *, n_img: int,
                         p1b: int, rbb: int, esb=None, wg=None,
                         interpret: bool, vmem_budget: int | None):
    """Assembly for the factored-gather kernel (see _kernel_factored)."""
    b, m, n2, s = xs.shape
    f = es.shape[2]
    nj, g = a1.shape[0], a1.shape[1]
    has_dx = esb is not None
    plan = factored_plan(m=m, n2=n2, s=s, f=f, nj=nj, g=g, p1b=p1b,
                         rbb=rbb, itemsize=jnp.dtype(xs.dtype).itemsize,
                         has_dx=has_dx, interpret=interpret,
                         vmem_budget=vmem_budget)
    k1_blk, n_k1 = plan["k1_blk"], plan["n_k1"]
    s_blk, f_blk = plan["s_blk"], plan["f_blk"]
    p1p = n_k1 * k1_blk
    kb_c = k1_blk * rbb

    a1 = jnp.transpose(a1, (1, 0, 2, 3))          # (G, nj, S, F)
    a2 = jnp.transpose(a2, (1, 0, 2, 3))

    if p1p != p1b:
        pad_bins = (p1p - p1b) * rbb
        xs = jnp.pad(xs, ((0, pad_bins), (0, 0), (0, 0), (0, 0)))
        es = jnp.pad(es, ((0, pad_bins), (0, 0), (0, 0)))
        if has_dx:
            esb = jnp.pad(esb, ((0, pad_bins), (0, 0), (0, 0)))
    t1c = t1[:p1b]
    t1s = t1[p1b:]
    if p1p != p1b:
        t1c = jnp.pad(t1c, ((0, p1p - p1b), (0, 0)))
        t1s = jnp.pad(t1s, ((0, p1p - p1b), (0, 0)))
    # pre-transposed, kc-chunked axis-1 tables for the E contraction (an
    # in-kernel transpose would be a relayout; a lane-dim chunk slice would
    # need 128-alignment - blocking a host-built (n_k1, nj, k1_blk) array
    # by kc needs neither)
    t1cT = jnp.transpose(t1c).reshape(nj, n_k1, k1_blk).transpose(1, 0, 2)
    t1sT = jnp.transpose(t1s).reshape(nj, n_k1, k1_blk).transpose(1, 0, 2)
    t2cT = jnp.transpose(t2[:rbb])                # (nj, rb)
    t2sT = jnp.transpose(t2[rbb:])

    # Block-diagonal batched tables: C k1 rows per k2-contraction dot and
    # the whole E stage as one dot per cos/sin (see _kernel_factored).
    c_blk = plan["c_blk"]
    eye_c = jnp.eye(c_blk, dtype=t2cT.dtype)
    t2cblk = (t2cT[:, None, None, :] * eye_c[None, :, :, None]
              ).reshape(nj * c_blk, c_blk * rbb)
    t2sblk = (t2sT[:, None, None, :] * eye_c[None, :, :, None]
              ).reshape(nj * c_blk, c_blk * rbb)
    eye_j = jnp.eye(nj, dtype=t1cT.dtype)
    t1cblk = (eye_j[None, :, None, :, None] * t1cT[:, None, :, None, :]
              ).reshape(n_k1, nj * nj, nj * k1_blk)
    t1sblk = (eye_j[None, :, None, :, None] * t1sT[:, None, :, None, :]
              ).reshape(n_k1, nj * nj, nj * k1_blk)

    grid = (s // s_blk, f // f_blk, n_k1)
    kern = functools.partial(
        _kernel_factored, n_img=n_img, m_filt=m, rbb=rbb, k1_blk=k1_blk,
        n_k1=n_k1, g_units=g, c_blk=c_blk,
        hi_precision=(jnp.dtype(xs.dtype) == jnp.float32), has_dx=has_dx)
    in_specs = [
        pl.BlockSpec((kb_c, m, n2, s_blk),
                     lambda si, fj, kc: (kc, 0, 0, si),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kb_c, n2, f_blk), lambda si, fj, kc: (kc, 0, fj),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xs, es.astype(xs.dtype)]
    if has_dx:
        in_specs += [
            pl.BlockSpec((kb_c, n2, f_blk), lambda si, fj, kc: (kc, 0, fj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s_blk, f_blk), lambda si, fj, kc: (0, si, fj),
                         memory_space=pltpu.VMEM),
        ]
        operands += [esb.astype(xs.dtype), wg.astype(xs.dtype)]
    in_specs += [
        pl.BlockSpec((nj, rbb), lambda si, fj, kc: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nj, rbb), lambda si, fj, kc: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nj * c_blk, c_blk * rbb), lambda si, fj, kc: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nj * c_blk, c_blk * rbb), lambda si, fj, kc: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nj * nj, nj * k1_blk),
                     lambda si, fj, kc: (kc, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nj * nj, nj * k1_blk),
                     lambda si, fj, kc: (kc, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [t2cT.astype(xs.dtype), t2sT.astype(xs.dtype),
                 t2cblk.astype(xs.dtype), t2sblk.astype(xs.dtype),
                 t1cblk.astype(xs.dtype), t1sblk.astype(xs.dtype)]
    if has_dx:
        in_specs += [
            pl.BlockSpec((p1p, nj), lambda si, fj, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p1p, nj), lambda si, fj, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * rbb, nj), lambda si, fj, kc: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [t1c.astype(xs.dtype), t1s.astype(xs.dtype),
                     t2.astype(xs.dtype)]
    in_specs += [
        pl.BlockSpec((g, nj, s_blk, f_blk),
                     lambda si, fj, kc: (0, 0, si, fj),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, nj, s_blk, f_blk),
                     lambda si, fj, kc: (0, 0, si, fj),
                     memory_space=pltpu.VMEM),
    ]
    operands += [a1.astype(xs.dtype), a2.astype(xs.dtype)]
    out_specs = pl.BlockSpec((m, g, s_blk, f_blk),
                             lambda si, fj, kc: (0, 0, si, fj),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m, g, s, f), jnp.float32)
    if has_dx:
        out_specs = [out_specs,
                     pl.BlockSpec((p1p * rbb, n2, s_blk),
                                  lambda si, fj, kc: (0, 0, si),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((p1p * rbb, n2, s), jnp.float32)]
    scratch_shapes = [
        pltpu.VMEM((kb_c, m * s_blk, f_blk), xs.dtype),
        pltpu.VMEM((kb_c, m * s_blk, f_blk), xs.dtype),
        pltpu.VMEM((nj, k1_blk, s_blk, f_blk), xs.dtype),
        pltpu.VMEM((nj, k1_blk, s_blk, f_blk), xs.dtype),
        # single-chunk plans never touch the E accumulator (the E value
        # feeds the combine directly); a minimal dummy keeps the signature
        pltpu.VMEM((1, 1, 1, min(8, s_blk), min(128, f_blk))
                   if n_k1 == 1 else (m, nj, nj, s_blk, f_blk),
                   jnp.float32),
    ]
    if has_dx:
        scratch_shapes += [pltpu.VMEM((k1_blk, s_blk, f_blk), jnp.float32),
                           pltpu.VMEM((k1_blk, s_blk, f_blk), jnp.float32)]
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    if has_dx:
        out, dxs = res
        return jnp.transpose(out, (0, 2, 1, 3)), dxs[:b]
    return jnp.transpose(res, (0, 2, 1, 3))       # -> (M, S, G, F)


def spectral_plan(*, m: int, n2: int, s: int, f: int, nj: int, g: int,
                  p1b: int, rbb: int, itemsize: int, has_dx: bool,
                  interpret: bool, vmem_budget: int | None = None):
    """Host-side grid/VMEM plan of the phi-gather kernel (shape math only,
    no device work). Returns {k1_blk, n_k1, s_blk, f_blk, single,
    vmem_budget}; raises FusedPlanError when no plan fits. Split out so
    tests/probes can pin production-shape plans off-chip."""
    f_blk, s_blk = _block_shapes(f, s, interpret)

    def footprint(k1_blk):
        kb_c = k1_blk * rbb
        xs_b = 2 * kb_c * m * n2 * s_blk * itemsize
        es_b = 2 * kb_c * n2 * f_blk * itemsize
        t_b = 2 * kb_c * m * s_blk * f_blk * itemsize
        phi_b = 2 * kb_c * s_blk * f_blk * 4
        z_b = 2 * kb_c * s_blk * f_blk * 4
        py_b = 2 * (k1_blk + rbb) * s_blk * f_blk * 4
        a_b = 4 * nj * g * s_blk * f_blk * itemsize
        total = xs_b + es_b + t_b + phi_b + z_b + py_b + a_b
        if has_dx:
            total += 2 * kb_c * n2 * f_blk * itemsize   # esb block (dbuf)
            total += kb_c * n2 * s_blk * 4              # dx out block
            total += 4 * rbb * s_blk * f_blk * 4        # per-k-group w*phi
            total += 2 * k1_blk * s_blk * f_blk * 4     # py scratch refs
        return total

    if vmem_budget is None:
        # the dx outputs add ~10 MB at the model shapes; a 100 MB budget
        # (25 MB Mosaic headroom under the 124 MB limit) pushed conv4 off
        # the single-chunk plan into 27 grid steps (~12 us tunnel overhead
        # each) - give the dx variant the measured-safe 112 MB instead
        vmem_budget = (112 if has_dx else 100) * 1024 * 1024
    budget = vmem_budget
    k1_blk = None
    if footprint(p1b) <= budget:
        k1_blk = p1b              # single chunk, exact table rows
    else:
        # multi-chunk: k1_blk must be a multiple of 8 so the in-kernel
        # table slice start is provably sublane-aligned
        for n_k1 in range(2, p1b + 1):
            cand = _ceil_to(-(-p1b // n_k1), 8)
            if footprint(cand) <= budget:
                k1_blk = cand
                break
    if k1_blk is None:
        raise FusedPlanError(
            f"fused_spectral_grads: no VMEM plan for B={p1b * rbb} M={m} "
            f"S={s} F={f}; use the unfused fourier path")
    n_k1 = -(-p1b // k1_blk)
    return dict(k1_blk=k1_blk, n_k1=n_k1, s_blk=s_blk, f_blk=f_blk,
                single=n_k1 == 1, vmem_budget=vmem_budget)


def fused_spectral_grads_call(xs, es, t1, t2, a1, a2, *, n_img: int,
                              p1b: int, rbb: int,
                              esb=None, wg=None,
                              interpret: bool | None = None,
                              vmem_budget: int | None = None,
                              gather: str = "phi"):
    """Invoke the fused backward kernel (spectral in-kernel gather).

    Args:
      xs: (B, M, 2N, S) blurred-input spectra, B = P1*rb bin-major.
      es: (B, 2N, F) error spectra.
      t1: (2*P1, nj) axis-1 [cos; sin] phase table.
      t2: (2*rb, nj) axis-2 table with the rfft conjugate-half coefficient
        and 1/(P1*P2) folded in.
      a1, a2: (nj, G, S, F) bilinear one-hot exponent weights (from mu1/mu2).
      esb: optional (B, 2N, F) spectra of the mirror-BLURRED error; when
        given (with wg) the kernel also emits the input-gradient spectra
        from the same in-VMEM phase factors.
      wg: (G, S, F) unit weights (dummy-masked), required with esb.

    Returns: (M, S, G, F) float32 unit gradients; with esb, a tuple
    (grads, dx_spectra) where dx_spectra is (B, 2N, S) float32 [dXre; dXim]
    (the caller applies the RAW partial iDFT: the rfft coefficient is
    already folded into the kernel's t2 table).
    """
    b, m, n2, s = xs.shape
    f = es.shape[2]
    nj, g = a1.shape[0], a1.shape[1]
    has_dx = esb is not None
    if has_dx and wg is None:
        raise ValueError("esb requires wg")
    if b != p1b * rbb:
        raise ValueError(f"B={b} != P1*rb={p1b * rbb}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if gather == "factored":
        return _fused_factored_call(
            xs, es, t1, t2, a1, a2, n_img=n_img, p1b=p1b, rbb=rbb,
            esb=esb, wg=wg, interpret=interpret, vmem_budget=vmem_budget)
    if gather != "phi":
        raise ValueError(f"unknown gather mode {gather!r}")
    plan = spectral_plan(m=m, n2=n2, s=s, f=f, nj=nj, g=g, p1b=p1b,
                         rbb=rbb, itemsize=jnp.dtype(xs.dtype).itemsize,
                         has_dx=has_dx, interpret=interpret,
                         vmem_budget=vmem_budget)
    k1_blk, n_k1 = plan["k1_blk"], plan["n_k1"]
    s_blk, f_blk = plan["s_blk"], plan["f_blk"]
    p1p = n_k1 * k1_blk

    # kernel-side layouts: units on the leading (untiled) dim of the one-hot
    # weights and of the output, so the per-unit loop indexes them
    # dynamically (see _kernel_spectral docstring)
    a1 = jnp.transpose(a1, (1, 0, 2, 3))          # (G, nj, S, F)
    a2 = jnp.transpose(a2, (1, 0, 2, 3))

    if p1p != p1b:
        # pad k1 rows: zero spectra + zero table rows contribute nothing
        pad_bins = (p1p - p1b) * rbb
        xs = jnp.pad(xs, ((0, pad_bins), (0, 0), (0, 0), (0, 0)))
        es = jnp.pad(es, ((0, pad_bins), (0, 0), (0, 0)))
        if has_dx:
            esb = jnp.pad(esb, ((0, pad_bins), (0, 0), (0, 0)))
    t1c = t1[:p1b]
    t1s = t1[p1b:]
    if p1p != p1b:
        t1c = jnp.pad(t1c, ((0, p1p - p1b), (0, 0)))
        t1s = jnp.pad(t1s, ((0, p1p - p1b), (0, 0)))

    # grid order (si, kc, fj): fj innermost so the dx-spectra output block
    # (indexed by kc, si only) sees CONSECUTIVE revisits and stays
    # VMEM-resident across its accumulation; the grads output instead takes
    # a per-kc partial dim (written once per step, summed by the caller:
    # n_k1 * M*G*S*F * 4 bytes of extra traffic, negligible next to the
    # dx-partials alternative).
    grid = (s // s_blk, n_k1, f // f_blk)
    kern = functools.partial(
        _kernel_spectral, n_img=n_img, m_filt=m, rbb=rbb, k1_blk=k1_blk,
        g_units=g, hi_precision=(jnp.dtype(xs.dtype) == jnp.float32),
        has_dx=has_dx)
    kb_c = k1_blk * rbb
    in_specs = [
        pl.BlockSpec((kb_c, m, n2, s_blk),
                     lambda si, kc, fj: (kc, 0, 0, si),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kb_c, n2, f_blk), lambda si, kc, fj: (kc, 0, fj),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xs, es.astype(xs.dtype)]
    if has_dx:
        in_specs += [
            pl.BlockSpec((kb_c, n2, f_blk), lambda si, kc, fj: (kc, 0, fj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s_blk, f_blk), lambda si, kc, fj: (0, si, fj),
                         memory_space=pltpu.VMEM),
        ]
        operands += [esb.astype(xs.dtype), wg.astype(xs.dtype)]
    in_specs += [
        pl.BlockSpec((p1p, nj), lambda si, kc, fj: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p1p, nj), lambda si, kc, fj: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * rbb, nj), lambda si, kc, fj: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, nj, s_blk, f_blk),
                     lambda si, kc, fj: (0, 0, si, fj),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, nj, s_blk, f_blk),
                     lambda si, kc, fj: (0, 0, si, fj),
                     memory_space=pltpu.VMEM),
    ]
    operands += [t1c.astype(xs.dtype), t1s.astype(xs.dtype),
                 t2.astype(xs.dtype), a1.astype(xs.dtype),
                 a2.astype(xs.dtype)]
    out_specs = pl.BlockSpec((1, m, g, s_blk, f_blk),
                             lambda si, kc, fj: (kc, 0, 0, si, fj),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_k1, m, g, s, f), jnp.float32)
    if has_dx:
        out_specs = [out_specs,
                     pl.BlockSpec((kb_c, n2, s_blk),
                                  lambda si, kc, fj: (kc, 0, si),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((p1p * rbb, n2, s), jnp.float32)]
    scratch_shapes = [pltpu.VMEM((kb_c, m * s_blk, f_blk), xs.dtype),
                      pltpu.VMEM((kb_c, m * s_blk, f_blk), xs.dtype)]
    if has_dx:
        # per-row py phase factors for the dx rebuild (see _kernel_spectral)
        scratch_shapes += [pltpu.VMEM((k1_blk, s_blk, f_blk), jnp.float32),
                           pltpu.VMEM((k1_blk, s_blk, f_blk), jnp.float32)]
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    if has_dx:
        out, dxs = res
    else:
        out = res
    grads = jnp.transpose(out.sum(axis=0), (0, 2, 1, 3))   # -> (M, S, G, F)
    if has_dx:
        return grads, dxs[:b]
    return grads
