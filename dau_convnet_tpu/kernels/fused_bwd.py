"""Fused Pallas backward: cross-spectra x partial-iDFT x tap-gather.

The fourier engine's parameter-gradient path is three dependent stages
(fourier_engine.py):

    T[k,m,s,f]   = sum_n X[k,m,n,s] * conj(E)[k,n,f]      (per-bin matmuls)
    tab[p,m,s,f] = sum_k D[p,k] * T[k,m,s,f]              (partial iDFT)
    grad[m,s,g,f]= sum_{4 taps} iw * tab[tap(mu), m,s,f]  (bilinear gather)

Run separately in XLA, the chain is HBM-bound on the cross-spectra
intermediate: T is B*M*S*F complex (~270 MB bf16 at AlexNet conv4) and is
written + re-read once per stage (measured 0.40 ms cross + 0.87 ms best
iDFT + gather). This kernel keeps T entirely in VMEM per (S, F) block -
the only HBM traffic is the input spectra (~30 MB) and the (M, S, G, F)
gradient output.

This is the TPU analogue of the reference's fused backward mega-kernel
(`DAUConv_bwd_multi_pipeline_kernel`, dau_conv_backward_core.hpp:1019-2119,
which also computes per-position correlations and per-unit reductions in
one on-chip pass) - but organized around the MXU: the per-bin cross
products and the position iDFT are matmuls; only the final 4-tap gather is
vector work.

Empirical Mosaic facts this design rests on (benchmarks/mosaic_probe.py,
v5e): 3D dot_general (P,K)x(K,A,B) compiles and is correct; *batched*
dot_general (B,M,K)x(B,K,N) does NOT compile in practical time (>580 s) -
hence the fori_loop of 2D dots for the per-bin stage; VMEM allows ~90 MB
of scratch; grid-step overhead is ~0.2 us.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_unit_grads_kernel_call", "fused_spectral_grads_call"]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan_blocks(b: int, m: int, s: int, f: int, n2: int, g: int,
                 itemsize: int, budget: int = 90 * 1024 * 1024):
    """Pick (s_blk, f_blk, kb, n_chunks) so the kernel's VMEM footprint
    (xs + es blocks double-buffered, T chunk, ptab accumulator) fits."""
    p = 1024  # placeholder, replaced by caller's ks*ks in the cost below
    f_blk = min(_ceil_to(f, 128), 128)
    for s_blk in (128, 96, 64, 48, 32, 16, 8):
        if s_blk > _ceil_to(s, 8):
            continue
        for n_chunks in (1, 2, 3, 4, 6, 8, 12, 16):
            kb = _ceil_to(-(-b // n_chunks), 8)
            xs_blk = kb * m * n2 * s_blk * itemsize * 2        # double-buffered
            es_blk = kb * n2 * f_blk * itemsize * 2
            t_chunk = kb * m * s_blk * f_blk * itemsize * 2    # re + im
            ptab = p // 1024 * 0  # counted below with real p by caller
            total = xs_blk + es_blk + t_chunk
            # ptab + gather temps: bounded by 81 * m * s_blk * f_blk * 4;
            # use the worst case ks=9 -> 81 positions
            total += 81 * m * s_blk * f_blk * 4
            total += 2 * m * s_blk * f_blk * 4  # dot temps headroom
            if kb < 64 and n_chunks > 1:
                continue  # keep the iDFT contraction K >= 64
            if total <= budget:
                return s_blk, f_blk, kb, n_chunks
    raise ValueError(
        f"fused_unit_grads: no VMEM plan for B={b} M={m} S={s} F={f} "
        f"(2N={n2}); use the unfused fourier path")


def _kernel(xs_ref, es_ref, dct_ref, dst_ref, mu1_ref, mu2_ref, out_ref,
            tre_buf, tim_buf, ptab_buf, *, n_img: int, m_filt: int,
            ks: int, g_units: int, use_interpolation: bool, kb: int,
            stages: str = "all"):
    """One (s_blk, f_blk, k-chunk) grid step.

    xs_ref:  (kb, M, 2N, s_blk)  input spectra, re/im stacked along 2N
    es_ref:  (kb, 2N, f_blk)     error spectra, [Ere; Eim] along 2N
    dct/dst: (P, kb)             partial-iDFT cos/sin matrices (chunk)
    mu1/mu2: (s_blk, G, f_blk)   f32 displacements
    out:     (M, s_blk, G, f_blk) f32 unit gradients
    scratch: tre/tim (kb, M, s_blk, f_blk); ptab (P, M*s_blk, f_blk) f32
    """
    kc = pl.program_id(2)
    n_kc = pl.num_programs(2)
    p_pos = ks * ks
    s_blk = mu1_ref.shape[0]
    f_blk = mu1_ref.shape[2]

    # ---- stage 1: per-bin cross products into VMEM scratch.
    # Tre[k] = [Xre|Xim] @ [Ere;Eim],  Tim[k] = [Xim|-Xre] @ [Ere;Eim]
    # (contraction over the stacked 2N axis = sublane dim of both operands).
    # Bins are processed in small-batch groups: one bin per dot is latency-
    # bound (~1000 sequential tiny dots per cell measured 2.6 ms at conv4),
    # while a full-B batched dot does not compile in practical time
    # (mosaic_probe) - groups of CG bins per batched dot are the middle.
    cdt = xs_ref.dtype
    cg = 8
    dnb = (((1,), (1,)), ((0,), (0,)))   # batch group dim, contract 2N

    def cross_body(i, carry):
        k0 = i * cg
        xsg = xs_ref[pl.ds(k0, cg)]          # (cg, M, 2N, s_blk)
        esg = es_ref[pl.ds(k0, cg)]          # (cg, 2N, f_blk)
        for mi in range(m_filt):
            lhs = xsg[:, mi]                 # (cg, 2N, s_blk)
            lhs_im = jnp.concatenate(
                [lhs[:, n_img:], -lhs[:, :n_img]], axis=1)
            # tre/tim are (kb, M*s_blk, f_blk): the M groups live as static
            # sublane slices so no implicit<->sublane relayout is ever needed
            # downstream (the idft dot and the gather slice them statically).
            sl = slice(mi * s_blk, (mi + 1) * s_blk)
            tre_buf[pl.ds(k0, cg), sl] = jax.lax.dot_general(
                lhs, esg, dnb,
                preferred_element_type=jnp.float32).astype(cdt)
            tim_buf[pl.ds(k0, cg), sl] = jax.lax.dot_general(
                lhs_im, esg, dnb,
                preferred_element_type=jnp.float32).astype(cdt)
        return carry

    jax.lax.fori_loop(0, kb // cg, cross_body, 0, unroll=False)

    if stages == "cross":  # debug attribution mode
        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            s_blk_ = mu1_ref.shape[0]
            f_blk_ = mu1_ref.shape[2]
            red = jnp.sum(tre_buf[0:1, :s_blk_], axis=0).astype(jnp.float32)
            out_ref[...] = jnp.broadcast_to(
                red[None, :, None, :],
                (m_filt, s_blk_, mu1_ref.shape[1], f_blk_))
        return

    # ---- stage 2: partial iDFT over this bin chunk, accumulated across
    # chunks:  ptab[p, (m s), f] += dct @ Tre - dst @ Tim.
    dn1 = (((1,), (0,)), ((), ()))
    tre = tre_buf[...]                       # (kb, M*s_blk, f_blk)
    tim = tim_buf[...]
    contrib = (jax.lax.dot_general(dct_ref[...], tre, dn1,
                                   preferred_element_type=jnp.float32)
               - jax.lax.dot_general(dst_ref[...], tim, dn1,
                                     preferred_element_type=jnp.float32))

    @pl.when(kc == 0)
    def _():
        ptab_buf[...] = contrib

    @pl.when(kc > 0)
    def _():
        ptab_buf[...] = ptab_buf[...] + contrib

    if stages == "idft":  # debug attribution mode
        @pl.when(kc == n_kc - 1)
        def _():
            red = jnp.sum(ptab_buf[0:1, :s_blk], axis=0)
            out_ref[...] = jnp.broadcast_to(
                red[None, :, None, :], (m_filt, s_blk, g_units, f_blk))
        return

    # ---- stage 3 (last chunk): bilinear 4-tap gather per unit.
    # Fully vectorized: build the (P, s_blk, g, f_blk) tap-weight mask with
    # broadcast compares against a position iota, then multiply-reduce
    # against the position table over P (static unroll over M and G only).
    # A p-indexed fori_loop of small slabs measured 1.6 ms at AlexNet conv4
    # (latency-bound, ~81 serialized VPU steps); this form is ~bandwidth.
    @pl.when(kc == n_kc - 1)
    def _():
        c = ks // 2
        mu1 = mu1_ref[...]
        mu2 = mu2_ref[...]
        f1 = jnp.floor(mu1)
        f2 = jnp.floor(mu2)
        if use_interpolation:
            a1 = mu1 - f1
            a2 = mu2 - f2
            taps = ((0, 0), (0, 1), (1, 0), (1, 1))
        else:
            a1 = jnp.zeros_like(mu1)
            a2 = jnp.zeros_like(mu2)
            taps = ((0, 0),)
        base = ((c + f2) * ks + (c + f1)).astype(jnp.int32)  # (s_blk, G, f_blk)
        piota = jax.lax.broadcasted_iota(
            jnp.int32, (p_pos, s_blk, f_blk), 0)
        def lead_sum(z):
            # Tree-reduce the leading (implicit) axis with explicit
            # slice+add steps: Mosaic has no implicit-dim reductions, but
            # elementwise ops over implicit dims vectorize fully.
            n = z.shape[0]
            while n > 1:
                half = n // 2
                odd = z[2 * half:n]
                z = z[:half] + z[half:2 * half]
                if odd.shape[0]:
                    z = jnp.concatenate([z[:1] + odd, z[1:]], axis=0)
                n = half
            return z[0]

        for gi in range(g_units):
            # one mask per g, shared by all M filters
            maskg = jnp.zeros((p_pos, s_blk, f_blk), jnp.float32)
            for dy, dx in taps:
                wx = (a1[:, gi] if dx else 1.0 - a1[:, gi])
                wy = (a2[:, gi] if dy else 1.0 - a2[:, gi])
                tgt = base[:, gi] + (dy * ks + dx)         # (s_blk, f_blk)
                maskg = maskg + jnp.where(piota == tgt[None],
                                          (wx * wy)[None], 0.0)
            for mi in range(m_filt):
                tab_m = ptab_buf[:, mi * s_blk:(mi + 1) * s_blk, :]
                out_ref[mi, :, gi, :] = lead_sum(maskg * tab_m)


def fused_unit_grads_kernel_call(xs, es, dct, dst, mu1, mu2, *, ks: int,
                                 n_img: int, use_interpolation: bool = True,
                                 interpret: bool | None = None):
    """Invoke the fused backward kernel.

    Args:
      xs: (B, M, 2N, S) blurred-input spectra, re/im stacked along 2N.
      es: (B, 2N, F) error spectra, [Ere; Eim] stacked along 2N.
      dct, dst: (P, B) partial-iDFT cos/sin matrices (P = ks*ks positions,
        rfft conjugate-half weights and 1/(P1*P2) folded in).
      mu1, mu2: (S, G, F) float32 unit displacements.
      ks: synthesized-kernel size (tap span).
      n_img: N (the batch size; 2N is the stacked axis).

    Returns: (M, S, G, F) float32 unit gradients (w-gather per filter m;
      the caller applies the w-multiplication / lr factors).
    """
    b, m, n2, s = xs.shape
    f = es.shape[2]
    g = mu1.shape[1]
    p_pos = ks * ks
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    itemsize = jnp.dtype(xs.dtype).itemsize

    s_blk, f_blk, kb, n_chunks = _plan_blocks(b, m, s, f, n2, g, itemsize)
    sp = _ceil_to(s, s_blk)
    fp = _ceil_to(f, f_blk)
    bp = kb * n_chunks
    if sp != s or bp != b:
        xs = jnp.pad(xs, ((0, bp - b), (0, 0), (0, 0), (0, sp - s)))
    if fp != f or bp != b:
        es = jnp.pad(es, ((0, bp - b), (0, 0), (0, fp - f)))
    if bp != b:
        dct = jnp.pad(dct, ((0, 0), (0, bp - b)))
        dst = jnp.pad(dst, ((0, 0), (0, bp - b)))
    if sp != s or fp != f:
        mu1 = jnp.pad(mu1, ((0, sp - s), (0, 0), (0, fp - f)))
        mu2 = jnp.pad(mu2, ((0, sp - s), (0, 0), (0, fp - f)))

    grid = (sp // s_blk, fp // f_blk, n_chunks)
    import os
    stages = os.environ.get("DAU_FUSED_STAGES", "all")
    kern = functools.partial(
        _kernel, n_img=n_img, m_filt=m, ks=ks, g_units=g,
        use_interpolation=use_interpolation, kb=kb, stages=stages)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb, m, n2, s_blk), lambda si, fj, kc: (kc, 0, 0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, n2, f_blk), lambda si, fj, kc: (kc, 0, fj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pos, kb), lambda si, fj, kc: (0, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pos, kb), lambda si, fj, kc: (0, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_blk, g, f_blk), lambda si, fj, kc: (si, 0, fj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_blk, g, f_blk), lambda si, fj, kc: (si, 0, fj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, s_blk, g, f_blk),
                               lambda si, fj, kc: (0, si, 0, fj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, sp, g, fp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kb, m * s_blk, f_blk), xs.dtype),
            pltpu.VMEM((kb, m * s_blk, f_blk), xs.dtype),
            pltpu.VMEM((p_pos, m * s_blk, f_blk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xs.astype(xs.dtype), es.astype(xs.dtype),
      dct.astype(xs.dtype), dst.astype(xs.dtype),
      mu1.astype(jnp.float32), mu2.astype(jnp.float32))
    return out[:, :s, :, :f]


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
# ---------------------------------------------------------------------------


def _kernel_spectral(xs_ref, es_ref, t1_ref, t2_ref, a1_ref, a2_ref, out_ref,
                     tre_buf, tim_buf, *, n_img: int, m_filt: int,
                     p1b: int, rbb: int, b_real: int, kb: int, g_units: int):
    """One (s_blk, f_blk) grid step.

    xs_ref: (kb, M, 2N, s_blk) input spectra (re/im stacked along 2N)
    es_ref: (kb, 2N, f_blk)    error spectra [Ere; Eim]
    t1_ref: (2*P1, nj)         [cos; sin] table, axis-1 (rows of the image)
    t2_ref: (2*rb, nj)         [cos; sin] table, axis-2, rfft coef folded
    a1/a2:  (nj, G, s_blk, f_blk)  bilinear one-hot exponent weights
    out:    (M, s_blk, G, f_blk) f32
    scratch: tre/tim (kb, M*s_blk, f_blk)
    """
    s_blk = a1_ref.shape[2]
    f_blk = a1_ref.shape[3]
    cdt = xs_ref.dtype
    cg = 8
    dnb = (((1,), (1,)), ((0,), (0,)))
    dn1 = (((1,), (0,)), ((), ()))

    def cross_body(i, carry):
        k0 = i * cg
        xsg = xs_ref[pl.ds(k0, cg)]
        esg = es_ref[pl.ds(k0, cg)]
        for mi in range(m_filt):
            lhs = xsg[:, mi]
            lhs_im = jnp.concatenate(
                [lhs[:, n_img:], -lhs[:, :n_img]], axis=1)
            sl = slice(mi * s_blk, (mi + 1) * s_blk)
            tre_buf[pl.ds(k0, cg), sl] = jax.lax.dot_general(
                lhs, esg, dnb,
                preferred_element_type=jnp.float32).astype(cdt)
            tim_buf[pl.ds(k0, cg), sl] = jax.lax.dot_general(
                lhs_im, esg, dnb,
                preferred_element_type=jnp.float32).astype(cdt)
        return carry

    jax.lax.fori_loop(0, kb // cg, cross_body, 0, unroll=False)

    # The gather stage is VMEM-traffic bound on its (B, s_blk, f_blk)
    # temporaries (phiU, Z: ~20 MB each per (g)/(m,g) in f32 at conv4) -
    # phase factors and products are stored bf16 (f32 dot accumulation),
    # halving the traffic; measured 0.98 -> see PERF_NOTES.
    ones = jnp.ones((1, b_real), cdt)
    for gi in range(g_units):
        a1g = a1_ref[:, gi]                       # (nj, s_blk, f_blk)
        a2g = a2_ref[:, gi]
        py = jax.lax.dot_general(t1_ref[...], a2g, dn1,
                                 preferred_element_type=jnp.float32)
        px = jax.lax.dot_general(t2_ref[...], a1g, dn1,
                                 preferred_element_type=jnp.float32)
        pyre, pyim = py[:p1b], py[p1b:]
        pxre, pxim = px[:rbb], px[rbb:]
        # unit phase factor over all bins, k = k1*rb + k2 (leading-dim
        # outer product + merge: implicit-dim reshape, no relayout)
        phire = (pyre[:, None] * pxre[None] - pyim[:, None] * pxim[None]
                 ).reshape(p1b * rbb, s_blk, f_blk)[:b_real].astype(cdt)
        phiim = (pyre[:, None] * pxim[None] + pyim[:, None] * pxre[None]
                 ).reshape(p1b * rbb, s_blk, f_blk)[:b_real].astype(cdt)
        for mi in range(m_filt):
            sl = slice(mi * s_blk, (mi + 1) * s_blk)
            z = (phire * tre_buf[:b_real, sl]
                 - phiim * tim_buf[:b_real, sl]).astype(cdt)
            red = jax.lax.dot_general(ones, z, dn1,
                                      preferred_element_type=jnp.float32)
            out_ref[mi, :, gi, :] = red[0]


def fused_spectral_grads_call(xs, es, t1, t2, a1, a2, *, n_img: int,
                              b_real: int, p1b: int, rbb: int,
                              interpret: bool | None = None):
    """Invoke the v2 fused backward kernel (spectral in-kernel gather).

    Args:
      xs: (B, M, 2N, S) blurred-input spectra (B padded to a multiple of 8).
      es: (B, 2N, F) error spectra.
      t1: (2*P1, nj) axis-1 [cos; sin] phase table.
      t2: (2*rb, nj) axis-2 table with the rfft conjugate-half coefficient
        and 1/(P1*P2) folded in.
      a1, a2: (nj, G, S, F) bilinear one-hot exponent weights (from mu1/mu2).
      b_real: number of real (un-padded) bins = P1*rb.

    Returns: (M, S, G, F) float32 unit gradients.
    """
    b, m, n2, s = xs.shape
    f = es.shape[2]
    nj, g = a1.shape[0], a1.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    itemsize = jnp.dtype(xs.dtype).itemsize

    f_blk = min(_ceil_to(f, 128), 128)
    kb = _ceil_to(b, 8)
    s_blk = None
    for cand in (128, 64, 32, 16, 8):
        if cand > _ceil_to(s, 8):
            continue
        xs_b = kb * m * n2 * cand * itemsize * 2
        es_b = kb * n2 * f_blk * itemsize * 2
        t_b = 2 * kb * m * cand * f_blk * itemsize
        phi_b = 2 * p1b * rbb * cand * f_blk * 4
        z_b = b_real * cand * f_blk * 4 * 2
        py_b = 2 * (p1b + rbb) * cand * f_blk * 4
        a_b = 2 * nj * g * cand * f_blk * itemsize * 2
        if xs_b + es_b + t_b + phi_b + z_b + py_b + a_b <= 100 * 1024 * 1024:
            s_blk = cand
            break
    if s_blk is None:
        raise ValueError(
            f"fused_spectral_grads: no VMEM plan for B={b} M={m} S={s} "
            f"F={f}; use the unfused fourier path")

    sp = _ceil_to(s, s_blk)
    fp = _ceil_to(f, f_blk)
    if sp != s or kb != b:
        xs = jnp.pad(xs, ((0, kb - b), (0, 0), (0, 0), (0, sp - s)))
    if fp != f or kb != b:
        es = jnp.pad(es, ((0, kb - b), (0, 0), (0, fp - f)))
    if sp != s or fp != f:
        a1 = jnp.pad(a1, ((0, 0), (0, 0), (0, sp - s), (0, fp - f)))
        a2 = jnp.pad(a2, ((0, 0), (0, 0), (0, sp - s), (0, fp - f)))

    grid = (sp // s_blk, fp // f_blk)
    kern = functools.partial(
        _kernel_spectral, n_img=n_img, m_filt=m, p1b=p1b, rbb=rbb,
        b_real=b_real, kb=kb, g_units=g)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb, m, n2, s_blk), lambda si, fj: (0, 0, 0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, n2, f_blk), lambda si, fj: (0, 0, fj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * p1b, nj), lambda si, fj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * rbb, nj), lambda si, fj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nj, g, s_blk, f_blk), lambda si, fj: (0, 0, si, fj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nj, g, s_blk, f_blk), lambda si, fj: (0, 0, si, fj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, s_blk, g, f_blk),
                               lambda si, fj: (0, si, 0, fj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, sp, g, fp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kb, m * s_blk, f_blk), xs.dtype),
            pltpu.VMEM((kb, m * s_blk, f_blk), xs.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xs, es.astype(xs.dtype), t1.astype(xs.dtype), t2.astype(xs.dtype),
      a1.astype(xs.dtype), a2.astype(xs.dtype))
    return out[:, :s, :, :f]
