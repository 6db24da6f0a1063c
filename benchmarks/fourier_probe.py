"""Focused TPU probe: Fourier engine vs dense-conv (spatial) engine.

Times the two hot components (forward aggregation, M=3 grad tables) under
both engines at AlexNet-DAU layer shapes, bf16. Run on the real chip:
    python benchmarks/fourier_probe.py [conv2|conv4]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402

from dau_convnet_tpu.ops import fourier_engine, xla_engine  # noqa: E402

DTYPE = jnp.bfloat16
N, G, KS = 32, 2, 9
SHAPES = {
    "conv2": (96, 256, 27),
    "conv3": (256, 384, 13),
    "conv4": (384, 384, 13),
}

def probe(name):
    S, F, HW = SHAPES[name]
    prec = jax.lax.Precision.DEFAULT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    xbm = jnp.stack([x, x * 0.5, -x])  # stand-in M=3 blurred inputs

    def keep(y, like):
        """Project result back to carry shape to chain iterations."""
        red = jnp.sum(y).astype(like.dtype)
        return like + red * 1e-30

    cases = {
        "dense_fwd": (lambda c: keep(xla_engine.aggregate_forward(
            c, w, mu1, mu2, KS, True, precision=prec), c), x),
        "fourier_fwd": (lambda c: keep(fourier_engine.fourier_forward(
            c, w, mu1, mu2, KS, True, precision=prec), c), x),
        "dense_tables": (lambda c: keep(xla_engine.grad_tables(
            xbm, c, KS, precision=prec), c), err),
        "fourier_tables": (lambda c: keep(fourier_engine.fourier_grad_tables(
            xbm, c, KS, precision=prec), c), err),
    }
    gmac = N * S * F * HW * HW * KS * KS / 1e9
    print(f"{name}: S={S} F={F} {HW}x{HW} N={N} bf16 "
          f"(dense fwd {gmac:.1f} GMAC, tables 3x)")
    out = {}
    for cname, (step, carry) in cases.items():
        t = time_chained(step, carry, iters=50)
        out[cname] = t
        print(f"  {cname:16s} {t * 1e3:8.3f} ms", flush=True)
    print(f"  fwd speedup {out['dense_fwd'] / out['fourier_fwd']:.2f}x   "
          f"tables speedup {out['dense_tables'] / out['fourier_tables']:.2f}x")

if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for name in (sys.argv[1:] or ["conv4"]):
        probe(name)
