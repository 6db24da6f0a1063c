"""Dense grad-tables variants: implicit pad vs explicit pad + VALID conv.

Run: python benchmarks/tables_padded_probe.py [conv4|conv2]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402
from benchmarks.fourier_probe import SHAPES  # noqa: E402

from dau_convnet_tpu.ops import xla_engine  # noqa: E402

DTYPE = jnp.bfloat16
N, KS, M = 32, 9, 3


def grad_tables_padded(x_blur_k, err, ks, precision):
    """Same contraction as xla_engine.grad_tables but with the halo padded
    explicitly and VALID conv windows: every output position contracts the
    full N*H*W (no boundary-clipped positions)."""
    m, n, s, h, w_sp = x_blur_k.shape
    f = err.shape[1]
    c = ks // 2
    lhs = jnp.transpose(x_blur_k, (0, 2, 1, 3, 4)).reshape(m * s, n, h, w_sp)
    lhs = jnp.pad(lhs, ((0, 0), (0, 0), (c, c), (c, c)))
    rhs = jnp.transpose(err, (1, 0, 2, 3))
    table = jax.lax.conv_general_dilated(
        lhs, rhs.astype(lhs.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=precision)
    return table.reshape(m, s, f, ks, ks)


def main(name):
    S, F, HW = SHAPES[name]
    prec = jax.lax.Precision.DEFAULT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    xbm = jnp.stack([x, x * 0.5, -x])
    print(f"{name}: S={S} F={F} {HW}x{HW}")

    a = xla_engine.grad_tables(xbm, err, KS, precision=prec)
    b = grad_tables_padded(xbm, err, KS, prec)
    print("  agree:", float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                            - b.astype(jnp.float32)))))

    def keep(y, like):
        return like + jnp.sum(y).astype(like.dtype) * 1e-30

    for label, fn in (("implicit pad", xla_engine.grad_tables),
                      ("explicit pad + VALID",
                       lambda xb, e, k, precision: grad_tables_padded(
                           xb, e, k, precision))):
        t = time_chained(lambda c: keep(fn(xbm, c, KS, precision=prec), c),
                         err, 50)
        print(f"  {label:24s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for nm in (sys.argv[1:] or ["conv4"]):
        main(nm)
