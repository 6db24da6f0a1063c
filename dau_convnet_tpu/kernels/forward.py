"""Fused Pallas forward kernel: blur + DAU aggregation in one VMEM pass.

TPU-native re-design of the reference's forward CUDA engine
(`DAUConv_forward_pipeline_kernel` + `interleave_input_data_kernel` +
`perpare_weights_and_offsets`, dau_conv_forward_core.hpp:804-2217). The CUDA
design is a software-pipelined shared-memory gather - per-thread dynamic
addressing that has no efficient TPU analogue. This kernel keeps the
*synthesized-kernel* formulation of the XLA engine (see ops/xla_engine.py)
and maps it onto the MXU as a sum of lane-offset matmuls.

Layout trick (reshape-free: Mosaic cannot merge (H, W) into lanes inside a
kernel): spatial planes are flattened to row-strided vectors OUTSIDE the
kernel, so the window of the padded plane at integer kernel position
(ky, kx) is exactly the lane slice `flat[..., off : off + L]` with
`off = ky * Wp + kx`. Reads that cross a row boundary land in the zero
padding of the neighbouring row, so

    y_flat[f, q] = sum_p  K_p[s, f] * xb_flat[s, q + off_p]

is exact on the valid (cropped) output region. Each position p is one MXU
contraction over S; the ks^2-position loop is the analogue of the
reference's per-patch pipeline, with Mosaic's automatic double-buffering
replacing the hand-rolled `BlockSharedMemory` (forward_core.hpp:227-470).

The fused variant additionally computes the Gaussian blur in-kernel (VPU
lane-offset FMAs on the same flat layout), so the blurred intermediate
never round-trips HBM (the reference materializes it per layer,
base_dau_conv_layer.cu:81-94).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import xla_engine
from ._vmem import check_vmem_budget

__all__ = ["aggregate_forward_pallas", "dau_forward_fused_pallas"]


def _round128(x: int) -> int:
    return (x + 127) // 128 * 128


def _flatten_padded(x4d, pad, tail):
    """(N, C, H, W) -> zero-padded (N, C, L) flat planes; L covers the padded
    grid + `tail` and is rounded to a lane multiple (Mosaic dynamic rolls
    require 128-aligned lane lengths). Sub-32-bit dtypes are upcast to f32:
    Mosaic's dynamic lane rotate only supports 32-bit data."""
    n, c, h, w = x4d.shape
    if x4d.dtype.itemsize < 4:
        x4d = x4d.astype(jnp.float32)
    xp = jnp.pad(x4d, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    l_full = (h + 2 * pad) * (w + 2 * pad)
    flat = xp.reshape(n, c, l_full)
    return jnp.pad(flat, ((0, 0), (0, 0), (0, _round128(l_full + tail) - l_full)))


def _agg_kernel(xb_ref, kern_ref, out_ref, *, ks: int, wp: int, l_out: int):
    """xb_ref: (1, S, Lt) flat blurred planes (padded by ks//2 + tail);
    kern_ref: (ks*ks, S, F_tile); out_ref: (1, F_tile, L_out).

    Dynamic lane-offset windows are realized as a dynamic lane-roll followed
    by an aligned prefix slice (Mosaic requires provably 128-aligned dynamic
    vector-load starts).
    """
    lt = xb_ref.shape[2]

    def ky_body(ky, acc):
        # one dynamic roll per kernel row; the kx offsets inside the row are
        # static prefix slices of it (ks dynamic rolls total instead of ks^2)
        row = pltpu.roll(xb_ref[0, :, :], lt - ky * wp, axis=1)
        for kx in range(ks):
            window = row[:, kx:kx + l_out]
            k_p = kern_ref[pl.ds(ky * ks + kx, 1), :, :][0]
            acc = acc + jax.lax.dot_general(
                k_p, window,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(
        0, ks, ky_body, jnp.zeros((out_ref.shape[1], l_out), jnp.float32))
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _run_aggregate(xb_flat, kern, ks, wp, l_out, h, w_sp, out_dtype,
                   f_tile, interpret):
    n, s, lt = xb_flat.shape
    f = kern.shape[2]  # kern: (ks*ks, S, F)
    if f_tile is None:
        f_tile = f if f <= 128 else 128
    while f % f_tile:
        f_tile //= 2

    l_pad = _round128(l_out)
    check_vmem_budget("pallas", [
        ("xb_planes", s * lt, 4),
        ("synth_kernel", ks * ks * s * f_tile, 4),
        ("out_tile", f_tile * l_pad, 4),
        ("acc", f_tile * l_pad, 4),
    ], interpret)
    kernel = functools.partial(_agg_kernel, ks=ks, wp=wp, l_out=l_pad)
    out = pl.pallas_call(
        kernel,
        grid=(n, f // f_tile),
        in_specs=[
            pl.BlockSpec((1, s, lt), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ks * ks, s, f_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f_tile, l_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f, l_pad), out_dtype),
        interpret=interpret,
    )(xb_flat, kern)
    # crop the row-strided output back to (N, F, H, W)
    return out[:, :, :l_out].reshape(n, f, h, wp)[:, :, :, :w_sp]


def aggregate_forward_pallas(x_blur, w, mu1, mu2, ks: int,
                             use_interpolation: bool = True,
                             f_tile: int | None = None,
                             interpret: bool | None = None):
    """Drop-in replacement for xla_engine.aggregate_forward (same contract).

    x_blur: (N, S, H, W) -> (N, F, H, W).
    """
    n, s, h, w_sp = x_blur.shape
    ca = ks // 2
    wp = w_sp + 2 * ca
    l_out = h * wp  # output rows i in [0, H), stride wp; cropped after
    # tail: max window offset + lane-padding of the output length
    tail = (ks - 1) * (wp + 1) + (_round128(l_out) - l_out) + 128

    kern = xla_engine.synthesize_kernel(w, mu1, mu2, ks, use_interpolation)
    # (S, F, ks, ks) -> (ks*ks, S, F): position-major for lane-safe indexing
    kern = jnp.transpose(kern.reshape(*kern.shape[:2], ks * ks), (2, 0, 1))

    xb_flat = _flatten_padded(x_blur, ca, tail)
    kern = kern.astype(xb_flat.dtype)  # dot operands must match (bf16 upcast)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _run_aggregate(xb_flat, kern, ks, wp, l_out, h, w_sp,
                          x_blur.dtype, f_tile, interpret)


def _fused_kernel(x_ref, filt_ref, kern_ref, mask_ref, out_ref, xb_ref, *,
                  kb: int, ks: int, wx: int, l_out: int, l_blur: int):
    """Blur (VPU) + aggregate (MXU) on the same flat Wx-strided grid.

    x_ref:    (1, S, Ltx) raw input, padded by pad = kb//2 + ks//2, + tail
    filt_ref: (kb, kb) blur filter (SMEM-ish small VMEM block)
    kern_ref: (ks*ks, S, F_tile) synthesized aggregation kernel
    mask_ref: (1, L_blur) 1.0 inside the valid (cropped) blur region
    out_ref:  (1, F_tile, L_out)
    xb_ref:   (S, L_blur + tail) scratch: blurred planes on the same grid
    """
    s = x_ref.shape[1]

    # acc[a*wx+b] = blur(x) at image coord (a - ca, b - ca): reading the
    # x window at flat offset dy*wx+dx from position (a, b) evaluates the
    # blur shifted by cb, which lands the valid image region at a,b in
    # [ca, ca+H) x [ca, ca+W) - exactly the halo the aggregation needs.
    ltx = x_ref.shape[2]

    def blur_body(dy, acc):
        row = pltpu.roll(x_ref[0, :, :], ltx - dy * wx, axis=1)
        for dx in range(kb):
            acc = acc + filt_ref[dy, dx] * row[:, dx:dx + l_blur].astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, kb, blur_body, jnp.zeros((s, l_blur), jnp.float32))
    # blur(x) is only valid (== reference's cropped intermediate) inside the
    # image; zero the halo so aggregation reads zeros outside. The mask also
    # zeroes the lane-padding region beyond the padded grid.
    acc = acc * mask_ref[0, :]
    xb_ref[:, 0:l_blur] = acc.astype(xb_ref.dtype)
    xb_ref[:, l_blur:] = jnp.zeros_like(xb_ref[:, l_blur:])

    lxb = xb_ref.shape[1]

    def agg_body(ky, out):
        row = pltpu.roll(xb_ref[:, :], lxb - ky * wx, axis=1)
        for kx in range(ks):
            k_p = kern_ref[pl.ds(ky * ks + kx, 1), :, :][0]
            out = out + jax.lax.dot_general(
                k_p, row[:, kx:kx + l_out],
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        return out

    out = jax.lax.fori_loop(
        0, ks, agg_body, jnp.zeros((out_ref.shape[1], l_out), jnp.float32))
    out_ref[0, :, :] = out.astype(out_ref.dtype)


def dau_forward_fused_pallas(x, w, mu1, mu2, blur_filter, ks: int,
                             use_interpolation: bool = True,
                             f_tile: int | None = None,
                             interpret: bool | None = None):
    """Fully fused blur + aggregation. x: (N, S, H, W) -> (N, F, H, W).

    Note the blur-then-aggregate chain shares one flat grid with row stride
    Wx = W + 2*(kb//2 + ks//2); the blurred scratch never leaves VMEM.
    """
    n, s, h, w_sp = x.shape
    f = w.shape[-1]
    kb = blur_filter.shape[-1]
    ca = ks // 2
    cb = kb // 2
    pad = ca + cb
    wx = w_sp + 2 * pad
    hx = h + 2 * pad
    # all in-kernel lane lengths are rounded to 128 (Mosaic roll requirement)
    l_blur = _round128(hx * wx)
    l_out = _round128(h * wx)
    tail = (kb - 1) * (wx + 1) + 128

    kern = xla_engine.synthesize_kernel(w, mu1, mu2, ks, use_interpolation)
    kern = jnp.transpose(kern.reshape(s, f, ks * ks), (2, 0, 1))  # (ks*ks,S,F)

    x_flat = _flatten_padded(x, pad, tail)
    kern = kern.astype(x_flat.dtype)  # dot operands must match (bf16 upcast)

    # valid-blur mask on the shifted acc grid (see _fused_kernel): the image
    # occupies rows/cols [ca, ca + H/W); lane padding beyond the grid is 0
    q = jnp.arange(l_blur)
    rows = q // wx
    cols = q % wx
    mask = (((rows >= ca) & (rows < ca + h) & (rows < hx)
             & (cols >= ca) & (cols < ca + w_sp))
            .astype(jnp.float32)[None])

    if f_tile is None:
        f_tile = f if f <= 128 else 128
    while f % f_tile:
        f_tile //= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    scratch_len = _round128(l_blur + (ks - 1) * (wx + 1) + 128)
    check_vmem_budget("pallas_fused", [
        ("x_planes", s * x_flat.shape[-1], 4),
        ("synth_kernel", ks * ks * s * f_tile, 4),
        ("mask", l_blur, 4),
        ("out_tile", f_tile * l_out, 4),
        ("blur_scratch", s * scratch_len, 4),
    ], interpret)

    # output lives on the same Wx-strided grid: out(i, j) at flat i*wx + j
    # reads xb at offset ky*wx + kx (the blur grid is already shifted by cb).
    kernel = functools.partial(_fused_kernel, kb=kb, ks=ks, wx=wx,
                               l_out=l_out, l_blur=l_blur)
    out = pl.pallas_call(
        kernel,
        grid=(n, f // f_tile),
        in_specs=[
            pl.BlockSpec((1, s, x_flat.shape[-1]), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # blur filter in SMEM: the kernel reads it as dynamically-indexed
            # scalars (VMEM lane loads must be 128-aligned)
            pl.BlockSpec((kb, kb), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ks * ks, s, f_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_blur), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f_tile, l_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f, l_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((s, _round128(l_blur + (ks - 1) * (wx + 1) + 128)),
                       jnp.float32),
        ],
        interpret=interpret,
    )(x_flat, blur_filter.astype(jnp.float32), kern, mask)
    return out[:, :, :h * wx].reshape(n, f, h, wx)[:, :, :, :w_sp]
