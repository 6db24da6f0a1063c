"""Whole-layer fwd+bwd timing per engine at AlexNet shapes (real TPU).

Run: python benchmarks/layer_probe.py [shapes...]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402
from benchmarks.fourier_probe import SHAPES  # noqa: E402

from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op  # noqa: E402
from dau_convnet_tpu.ops import fourier_engine as fe  # noqa: E402

DTYPE = jnp.bfloat16
N, G, KS, M = 32, 2, 9, 3


def main(name):
    S, F, HW = SHAPES[name]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    w = jnp.asarray(rng.standard_normal((1, S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (1, S, G, F)), DTYPE)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (1, S, G, F)), DTYPE)
    sigma = jnp.full((1,), 0.5, DTYPE)
    print(f"{name}: S={S} F={F} {HW}x{HW} N={N}")

    def timed(label, step, carry):
        t = time_chained(step, carry, 40)
        print(f"  {label:30s} {t*1e3:8.3f} ms", flush=True)
        return t

    for engine in ("xla", "fourier"):
        cfg = DAUConvSettings(kernel_size=KS, compute_sigma_grad=False,
                              precision="default", engine=engine)

        def layer_step(c):
            def f(x):
                y = dau_conv2d_op(cfg, x, w, mu1, mu2, sigma)
                return jnp.vdot(y, err)
            _, dx = jax.value_and_grad(f)(c)
            return c - jnp.asarray(1e-6, DTYPE) * dx
        timed(f"layer fwd+bwd [{engine}]", layer_step, x)

    # spectral tap-gather isolated
    prec = jax.lax.Precision.DEFAULT
    xbm = jnp.stack([x, x * 0.5, -x])
    mu1s, mu2s = mu1[0], mu2[0]

    def ug_step(c):
        g = fe.fourier_unit_grads(xbm, c, mu1s, mu2s, KS, True, precision=prec)
        return c + jnp.sum(g).astype(c.dtype) * 1e-30
    timed("fourier_unit_grads (M=3)", ug_step, err)

    # forward-only, fourier
    def fwd_step(c):
        y = dau_conv2d_op(DAUConvSettings(kernel_size=KS, precision="default",
                                          engine="fourier"),
                          c, w, mu1, mu2, sigma)
        return c + jnp.sum(y).astype(c.dtype) * 1e-30
    timed("layer fwd only [fourier]", fwd_step, x)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for nm in (sys.argv[1:] or ["conv4", "conv2"]):
        main(nm)
