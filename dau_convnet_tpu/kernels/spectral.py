"""Pallas helper kernels for the Fourier engine.

One job today: the partial inverse-DFT of the backward cross-spectra,

    table[p, c] = sum_k C[k,p] * tre[k,c] - S[k,p] * tim[k,c]

a plain (81, B) x (B, M*S*F) matmul pair. XLA executes every layout of this
contraction pathologically (1.5-3 ms at AlexNet conv4 for ~11 GMAC + 140 MB
of IO - measured in benchmarks/fourier_parts4.py); the Pallas version is a
straightforward chunked matmul that runs at HBM bandwidth. This is NOT one
of the VMEM-hungry plane kernels (kernels/forward.py) - block sizes are a
few hundred KB regardless of model shape.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["partial_idft"]


def _idft_kernel(cm_ref, sm_ref, tre_ref, tim_ref, out_ref):
    """cm/sm: (B, P) iDFT matrices; tre/tim: (B, CH) spectrum chunk;
    out: (P, CH)."""
    dn = (((0,), (0,)), ((), ()))
    acc = jax.lax.dot_general(cm_ref[...], tre_ref[...], dn,
                              preferred_element_type=jnp.float32)
    acc -= jax.lax.dot_general(sm_ref[...], tim_ref[...], dn,
                               preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def partial_idft(cmat, smat, tre, tim, out_dtype=jnp.float32,
                 interpret: bool | None = None):
    """(P-position partial inverse rDFT) table = C^T @ tre - S^T @ tim.

    Args:
      cmat, smat: (B, P) matrices from fourier_engine._idft_mats.
      tre, tim: (B, C) cross-spectra (C = flattened M*S*F; bin-major).

    Returns: (P, C) table, position-major.
    """
    b, p = cmat.shape
    c = tre.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Chunks as big as the ~16 MB scoped-VMEM stack allows (Mosaic double-
    # buffers each block, so budget half): per-grid-step overhead dominates
    # with small blocks (measured ~12 us/step over the axon tunnel).
    in_b = jnp.dtype(tre.dtype).itemsize
    out_b = jnp.dtype(out_dtype).itemsize
    budget = 7 * 1024 * 1024
    ch = 16384
    while ch > 128 and (c % ch or ch * (2 * b * in_b + p * out_b) > budget):
        ch //= 2
    if c % ch:  # pad the chunk axis up to a multiple of 128
        pad = (c + 127) // 128 * 128 - c
        tre = jnp.pad(tre, ((0, 0), (0, pad)))
        tim = jnp.pad(tim, ((0, 0), (0, pad)))
        ch = 128
        cp = tre.shape[1]
    else:
        cp = c

    cmat = cmat.astype(tre.dtype)
    smat = smat.astype(tre.dtype)

    out = pl.pallas_call(
        _idft_kernel,
        grid=(cp // ch,),
        in_specs=[
            pl.BlockSpec((b, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, ch), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, ch), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p, ch), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, cp), out_dtype),
        interpret=interpret,
    )(cmat, smat, tre, tim)
    return out[:, :c]
