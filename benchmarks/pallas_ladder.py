"""Pallas throughput ladder: where does the ~12us/step + low DMA rate
come from? Measures a copy kernel and the idft dot at several chunk sizes
on the same (B, C) data. Run on the real chip."""

import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402

B, P = 153, 81
C = 442368  # conv4 M*S*F
DTYPE = jnp.bfloat16


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def dot_kernel(cm_ref, sm_ref, tre_ref, tim_ref, out_ref):
    dn = (((0,), (0,)), ((), ()))
    acc = jax.lax.dot_general(cm_ref[...], tre_ref[...], dn,
                              preferred_element_type=jnp.float32)
    acc -= jax.lax.dot_general(sm_ref[...], tim_ref[...], dn,
                               preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def run_copy(x, ch):
    return pl.pallas_call(
        copy_kernel,
        grid=(C // ch,),
        in_specs=[pl.BlockSpec((B, ch), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, ch), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), DTYPE),
        interpret=False,
    )(x)


def run_dot(cm, sm, tre, tim, ch):
    return pl.pallas_call(
        dot_kernel,
        grid=(C // ch,),
        in_specs=[
            pl.BlockSpec((B, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ch), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ch), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, ch), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, C), DTYPE),
        interpret=False,
    )(cm, sm, tre, tim)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C)), DTYPE)
    y = jnp.asarray(rng.standard_normal((B, C)), DTYPE)
    cm = jnp.asarray(rng.standard_normal((B, P)), DTYPE)
    sm = jnp.asarray(rng.standard_normal((B, P)), DTYPE)

    def keep(o, like):
        return like + jnp.sum(o).astype(like.dtype) * 1e-30

    for ch in (2048, 8192):
        t = time_chained(lambda c: keep(run_copy(c, ch), c), x, 40)
        gbs = (B * C * 2 * 2) / t / 1e9
        print(f"copy  ch={ch:6d}: {t*1e3:7.3f} ms  ({gbs:5.0f} GB/s)",
              flush=True)
    for ch in (2048, 8192):
        t = time_chained(lambda c: keep(run_dot(cm, sm, c, y, ch), c), x, 40)
        io = (2 * B * C * 2 + P * C * 2)
        print(f"dot   ch={ch:6d}: {t*1e3:7.3f} ms  ({io / t / 1e9:5.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    main()
