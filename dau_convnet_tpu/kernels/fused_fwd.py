"""Fused Pallas forward: phase table + per-bin matmuls + partial iDFT.

The fourier engine's forward chain is (fourier_engine.py):

    Phi[k,ci,co] = sum_g w[ci,g,co] * py(mu2)[k1] * px(mu1)[k2]
    Y[k,n,co]    = sum_ci X[k,n,ci] * Phi[k,ci,co]     (per-bin matmuls)
    y[n,co,ij]   = partial-iDFT_ij(Y)                  (one matmul)

Run in XLA, Phi (45-90 MB) and Y are materialized in HBM between stages.
This kernel builds Phi per (k1-chunk, co-tile) in VMEM from the integer
cos/sin phase tables (the same trick as kernels/fused_bwd.py), runs the
per-bin complex dots out of VMEM, and applies the iDFT as a 3D dot with
cross-chunk accumulation - Phi and Y never touch HBM.

The INPUT GRADIENT is the same kernel: dx contracts over F with
conj(Phi) (reference identity base_dau_conv_layer.cu:294-325 in the
spectral domain), and conj(Phi(mu)) is the product of conjugated 1D
factors, i.e. the same tables with negated sin halves - the wrapper
passes ci=F, co=S, sin-negated tables, and F-major one-hot layouts.

Mosaic facts inherited from fused_bwd.py: batched dots with batch=rb,
3D (P,K)x(K,A,B) dots, f32 phase temporaries, 8-aligned dynamic sublane
slices, and the (8,128) last-two-dims block rule (multi-chunk k1 needs
kb_c % 128 == 0 for the iDFT column blocks; otherwise single-chunk or
fall back to the unfused path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_apply_phi_call"]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(xs_ref, t1c_ref, t1s_ref, t2_ref, aw_ref, a_ref, dct_ref,
            dst_ref, out_ref, phre_buf, phim_buf, yre_buf, yim_buf, *,
            n_img: int, rbb: int, k1_blk: int, g_units: int,
            hi_precision: bool):
    """One (co-tile, k1-chunk) grid step.

    xs_ref:  (kb_c, 2N, CI)   input spectra, re/im stacked along 2N
    t1c/t1s: (p1_pad, nj)     axis-1 cos / sin tables (sliced per chunk)
    t2_ref:  (2*rb, nj)       axis-2 [cos; sin] table
    aw_ref:  (nj, G, CI, co)  bilinear one-hot with w folded ("py" side)
    a_ref:   (nj, G, CI, co)  plain bilinear one-hot ("px" side)
    dct/dst: (HWp, kb_c)      partial-iDFT matrices (this chunk's columns)
    out_ref: (HWp, N, co)     f32, accumulated across k1 chunks
    scratch: phre/phim (kb_c, CI, co) f32; yre/yim (kb_c, N, co) f32
    """
    kc = pl.program_id(1)
    ci = aw_ref.shape[2]
    co = aw_ref.shape[3]
    kb_c = k1_blk * rbb
    dn1 = (((1,), (0,)), ((), ()))
    dnb = (((2,), (1,)), ((0,), (0,)))
    # HIGHEST for f32 operands: Mosaic's default f32 dot is truncated
    # (bf16-class error, caught by benchmarks/tpu_oracle_check.py on the
    # sibling backward kernel)
    prec = (jax.lax.Precision.HIGHEST if hi_precision
            else jax.lax.Precision.DEFAULT)

    def dot(a, b, dn):
        return jax.lax.dot_general(a, b, dn, precision=prec,
                                   preferred_element_type=jnp.float32)

    if t1c_ref.shape[0] == k1_blk:
        t1c = t1c_ref[...]
        t1s = t1s_ref[...]
    else:
        t1c = t1c_ref[pl.ds(kc * k1_blk, k1_blk)]
        t1s = t1s_ref[pl.ds(kc * k1_blk, k1_blk)]

    # ---- stage 1: Phi chunk in VMEM, accumulated over g.
    # phi is STORED in the operand dtype (bf16 in production): it only
    # feeds MXU dots, so narrow storage halves the scratch; and the
    # k1-row outer products are built in <=4-row-group slices so the f32
    # product temporaries stay bounded (a full (kb_c, CI, co) f32 pair is
    # 60 MB at AlexNet conv4 - the whole VMEM budget).
    n_slices = min(8, k1_blk)
    rows_per = -(-k1_blk // n_slices)
    dt = phre_buf.dtype
    for gi in range(g_units):
        awg = aw_ref[:, gi]                       # (nj, CI, co)
        ag = a_ref[:, gi]
        pyre = dot(t1c, awg, dn1)
        pyim = dot(t1s, awg, dn1)
        px = dot(t2_ref[...], ag, dn1)
        pxre, pxim = px[:rbb], px[rbb:]
        for si in range(n_slices):
            r0 = si * rows_per
            r1 = min(k1_blk, r0 + rows_per)
            if r0 >= r1:
                continue
            yre_s = pyre[r0:r1]
            yim_s = pyim[r0:r1]
            pre = (yre_s[:, None] * pxre[None] - yim_s[:, None] * pxim[None]
                   ).reshape((r1 - r0) * rbb, ci, co).astype(dt)
            pim = (yre_s[:, None] * pxim[None] + yim_s[:, None] * pxre[None]
                   ).reshape((r1 - r0) * rbb, ci, co).astype(dt)
            sl = slice(r0 * rbb, r1 * rbb)
            if gi == 0:
                phre_buf[sl] = pre
                phim_buf[sl] = pim
            else:
                phre_buf[sl] = phre_buf[sl] + pre
                phim_buf[sl] = phim_buf[sl] + pim

    # ---- stage 2: per-bin complex matmuls Y = X @ Phi (batch = rb bins)
    def bin_body(i, carry):
        k0 = i * rbb
        xsg = xs_ref[pl.ds(k0, rbb)]              # (rb, 2N, CI)
        d1 = dot(xsg, phre_buf[pl.ds(k0, rbb)], dnb)
        d2 = dot(xsg, phim_buf[pl.ds(k0, rbb)], dnb)
        yre_buf[pl.ds(k0, rbb)] = d1[:, :n_img] - d2[:, n_img:]
        yim_buf[pl.ds(k0, rbb)] = d2[:, :n_img] + d1[:, n_img:]
        return carry

    jax.lax.fori_loop(0, k1_blk, bin_body, 0, unroll=False)

    # ---- stage 3: partial iDFT over this chunk, accumulated across chunks
    contrib = (dot(dct_ref[...], yre_buf[...], dn1)
               - dot(dst_ref[...], yim_buf[...], dn1))

    @pl.when(kc == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(kc > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def fused_apply_phi_call(xs, t1, t2, aw, a, dct, dst, *, n_img: int,
                         p1b: int, rbb: int,
                         interpret: bool | None = None,
                         vmem_budget: int = 100 * 1024 * 1024):
    """Invoke the fused forward/input-grad kernel.

    Args:
      xs: (B, 2N, CI) input spectra (re/im stacked along rows), B = P1*rb.
      t1: (2*P1, nj) axis-1 [cos; sin] phase table (sin-negated for the
        conj/dx direction).
      t2: (2*rb, nj) axis-2 table.
      aw: (nj, G, CI, CO) bilinear one-hot weights with w folded in.
      a:  (nj, G, CI, CO) plain bilinear one-hot weights.
      dct, dst: (HWp, B) partial-iDFT matrices (rfft conjugate-half
        coefficient and 1/(P1*P2) folded in; HWp is 8-padded).

    Returns: (HWp, N, CO) float32 spatial output (caller slices HW and
    transposes to (N, CO, H, W)).
    """
    b, n2, ci = xs.shape
    nj, g, ci2, co = aw.shape
    hwp = dct.shape[0]
    if b != p1b * rbb or ci2 != ci:
        raise ValueError(f"shape mismatch: {xs.shape} vs {aw.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    itemsize = jnp.dtype(xs.dtype).itemsize

    # compiled Mosaic requires 128-multiple LANE dims in the 3D dots
    # (CO in the phase/per-bin dots, CI in the xs operand); interpret mode
    # (small-shape tests) has no such constraint
    if co % 128 == 0:
        co_blk = 128
    elif interpret and co % 8 == 0 and co <= 512:
        co_blk = co
    else:
        raise ValueError(f"fused_apply_phi: unsupported CO={co}")
    if ci % 8 != 0 or ci > 512 or (not interpret and ci % 128 != 0):
        raise ValueError(f"fused_apply_phi: unsupported CI={ci}")

    def footprint(k1_blk):
        kb_c = k1_blk * rbb
        xs_b = 2 * kb_c * n2 * ci * itemsize
        phi_b = 2 * kb_c * ci * co_blk * itemsize
        rows_per = -(-k1_blk // min(8, k1_blk))
        prod_b = 4 * rows_per * rbb * ci * co_blk * 4  # f32 slice temps
        y_b = 2 * kb_c * n_img * co_blk * 4
        py_b = 2 * (k1_blk + 2 * rbb) * ci * co_blk * 4
        a_b = 4 * nj * g * ci * co_blk * itemsize
        d_b = 4 * hwp * kb_c * itemsize
        return xs_b + phi_b + prod_b + y_b + py_b + a_b + d_b

    k1_blk = None
    if footprint(p1b) <= vmem_budget:
        k1_blk = p1b
    else:
        for n_k1 in range(2, p1b + 1):
            cand = _ceil_to(-(-p1b // n_k1), 8)
            if (cand * rbb) % 128 == 0 and footprint(cand) <= vmem_budget:
                k1_blk = cand
                break
    if k1_blk is None:
        raise ValueError(
            f"fused_apply_phi: no VMEM plan for B={b} CI={ci} CO={co}; "
            "use the unfused fourier path")
    n_k1 = -(-p1b // k1_blk)
    p1p = n_k1 * k1_blk

    t1c = t1[:p1b]
    t1s = t1[p1b:]
    if p1p != p1b:
        pad_bins = (p1p - p1b) * rbb
        xs = jnp.pad(xs, ((0, pad_bins), (0, 0), (0, 0)))
        dct = jnp.pad(dct, ((0, 0), (0, pad_bins)))
        dst = jnp.pad(dst, ((0, 0), (0, pad_bins)))
        t1c = jnp.pad(t1c, ((0, p1p - p1b), (0, 0)))
        t1s = jnp.pad(t1s, ((0, p1p - p1b), (0, 0)))

    grid = (co // co_blk, n_k1)
    kern = functools.partial(_kernel, n_img=n_img, rbb=rbb, k1_blk=k1_blk,
                             g_units=g,
                             hi_precision=(jnp.dtype(xs.dtype) == jnp.float32))
    kb_c = k1_blk * rbb
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb_c, n2, ci), lambda cj, kc: (kc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p1p, nj), lambda cj, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p1p, nj), lambda cj, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * rbb, nj), lambda cj, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nj, g, ci, co_blk), lambda cj, kc: (0, 0, 0, cj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nj, g, ci, co_blk), lambda cj, kc: (0, 0, 0, cj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, kb_c), lambda cj, kc: (0, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, kb_c), lambda cj, kc: (0, kc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hwp, n_img, co_blk),
                               lambda cj, kc: (0, 0, cj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hwp, n_img, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kb_c, ci, co_blk), xs.dtype),
            pltpu.VMEM((kb_c, ci, co_blk), xs.dtype),
            pltpu.VMEM((kb_c, n_img, co_blk), jnp.float32),
            pltpu.VMEM((kb_c, n_img, co_blk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xs, t1c.astype(xs.dtype), t1s.astype(xs.dtype), t2.astype(xs.dtype),
      aw.astype(xs.dtype), a.astype(xs.dtype), dct.astype(xs.dtype),
      dst.astype(xs.dtype))
    return out
