"""Fused Pallas backward kernel: the parameter-gradient position table.

TPU-native re-design of the reference's backward CUDA engine
(`DAUConv_bwd_multi_pipeline_kernel`, dau_conv_backward_core.hpp:1019-2119),
which reduces `out[S,G,F,K] = sum_{n,px} pre_blurred_k[n,s,px+off] *
err[n,f,px]` with warp-level accumulation over hand-interleaved inputs.

Here the reduction is MXU-first on the same flat row-strided layout as the
forward kernel (see kernels/forward.py docstring): for each integer kernel
position p, the contraction over all pixels of one image is a single matmul

    table[p, :, :] += err_flat [F, Lv] @ window_p(xb_flat) [M*S, Lv]^T

with the error zero-embedded in the padded grid (so row-wrap reads multiply
zeros - the contraction is exact). The batch is accumulated via the
sequential TPU grid: the output block stays resident in VMEM across steps,
replacing the reference's warp-level reduction tree. All M derivative
filters (w, mu1, mu2[, sigma]) ride one kernel pass, collapsing the
reference's OUT_K-tiered multi-launch loop (dau_conv_backward.cpp:194-231).

Per-unit gradients are gathered from the table by the XLA tap-gather einsum
(ops/xla_engine.tap_gather); the input gradient reuses the forward kernel
with transposed/negated parameters (reference identity,
base_dau_conv_layer.cu:294-325).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._vmem import check_vmem_budget

__all__ = ["grad_tables_pallas"]


def _table_kernel(xb_ref, err_ref, out_ref, *, ks: int, wp: int,
                  d_off: int, lv: int):
    """Grid step = one image n.

    xb_ref:  (1, M*S, Lt) flat derivative-blurred planes, padded by ks//2
    err_ref: (1, F, L) flat error, zero-embedded at the same padding
    out_ref: (ks*ks, F, M*S) accumulated position table
    """
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        out_ref[:, :, :] = jnp.zeros_like(out_ref)

    le = err_ref.shape[2]
    err = pltpu.roll(err_ref[0, :, :], le - d_off, axis=1)[:, :lv]

    lt = xb_ref.shape[2]

    def body(ky, _):
        row = pltpu.roll(xb_ref[0, :, :], lt - ky * wp, axis=1)
        for kx in range(ks):
            contrib = jax.lax.dot_general(
                err, row[:, kx:kx + lv],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (F, M*S)
            out_ref[pl.ds(ky * ks + kx, 1), :, :] += (
                contrib.astype(out_ref.dtype)[None])
        return 0

    jax.lax.fori_loop(0, ks, body, 0)


def grad_tables_pallas(x_blur_k, err, ks: int, interpret: bool | None = None):
    """Same contract as ops.xla_engine.grad_tables.

    Args:
      x_blur_k: (M, N, S, H, W) input blurred with each derivative filter.
      err: (N, F, H, W).

    Returns: (M, S, F, ks, ks) float32 table.
    """
    m, n, s, h, w_sp = x_blur_k.shape
    f = err.shape[1]
    ca = ks // 2
    wp = w_sp + 2 * ca
    hp = h + 2 * ca
    l_full = hp * wp

    def round128(v):
        return (v + 127) // 128 * 128

    lv = round128((h - 1) * wp + w_sp)  # span of valid pixels, lane-aligned
    d_off = ca * wp + ca                # flat offset of image origin
    lt = round128(l_full + (ks - 1) * (wp + 1) + 128)

    # (M, N, S, H, W) -> (N, M*S, Hp, Wp) -> flat, lane-aligned + tail
    # (upcast below 32 bits: Mosaic dynamic rotate is 32-bit only)
    if x_blur_k.dtype.itemsize < 4:
        x_blur_k = x_blur_k.astype(jnp.float32)
    if err.dtype.itemsize < 4:
        err = err.astype(jnp.float32)
    xb = jnp.transpose(x_blur_k, (1, 0, 2, 3, 4)).reshape(n, m * s, h, w_sp)
    xb = jnp.pad(xb, ((0, 0), (0, 0), (ca, ca), (ca, ca)))
    xb = jnp.pad(xb.reshape(n, m * s, l_full), ((0, 0), (0, 0), (0, lt - l_full)))

    # error embedded in the padded grid (zeros in the halo, row padding, and
    # the lane-padding tail - so the widened lv contraction stays exact)
    le = round128(l_full + lv - (l_full - d_off) + 128) if d_off + lv > l_full else round128(l_full)
    ep = jnp.pad(err.astype(xb.dtype), ((0, 0), (0, 0), (ca, ca), (ca, ca)))
    ep = jnp.pad(ep.reshape(n, f, l_full), ((0, 0), (0, 0), (0, le - l_full)))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    check_vmem_budget("pallas (grad tables)", [
        ("xb_planes", m * s * xb.shape[-1], 4),
        ("err_planes", f * ep.shape[-1], 4),
        ("table", ks * ks * f * m * s, 4),
    ], interpret)

    kernel = functools.partial(_table_kernel, ks=ks, wp=wp, d_off=d_off, lv=lv)
    table = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m * s, xb.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, ep.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ks * ks, f, m * s), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ks * ks, f, m * s), jnp.float32),
        interpret=interpret,
    )(xb, ep)

    # (ks^2, F, M*S) -> (M, S, F, ks, ks)
    table = table.reshape(ks, ks, f, m, s)
    return jnp.transpose(table, (3, 4, 2, 0, 1))
