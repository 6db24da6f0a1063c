"""Fused Pallas backward vs unfused spectral gather, real TPU, bf16.

Run: python benchmarks/fused_bwd_probe.py [--g 4] [--gather phi|factored]
     [conv2 conv3 conv4 conv5]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402
from dau_convnet_tpu.ops import fourier_engine as fe  # noqa: E402

DTYPE = jnp.bfloat16
N, G, KS, M = 32, 2, 9, 3
GATHER = "phi"
if "--g" in sys.argv:
    i = sys.argv.index("--g")
    G = int(sys.argv[i + 1])
    del sys.argv[i:i + 2]
if "--gather" in sys.argv:
    i = sys.argv.index("--gather")
    GATHER = sys.argv[i + 1]
    del sys.argv[i:i + 2]
PREC = jax.lax.Precision.DEFAULT
SHAPES = {"conv2": (96, 256, 27), "conv3": (256, 384, 13),
          "conv4": (384, 384, 13), "conv5": (384, 256, 13)}


def probe(name):
    S, F, HW = SHAPES[name]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    gyb = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    xbm = jnp.stack([x, x * 0.5, -x])
    print(f"{name}: S={S} F={F} {HW}x{HW}", flush=True)

    # correctness first (bf16 tolerance)
    t0 = time.time()
    a = jax.jit(lambda: fe.fourier_unit_grads(
        xbm, err, mu1, mu2, KS, True, precision=PREC))()
    b = jax.jit(lambda: fe.fourier_unit_grads_fused2(
        xbm, err, mu1, mu2, KS, True, precision=PREC, gather=GATHER))()
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"  v2 rel diff {rel:.2e}  (compile+run {time.time()-t0:.0f}s)",
          flush=True)
    assert rel < 3e-2, rel

    def keep(y, like):
        return like + jnp.sum(y).astype(like.dtype) * 1e-30

    def unfused_withdx(c):
        g = fe.fourier_unit_grads(xbm, c, mu1, mu2, KS, True, precision=PREC)
        p1, p2, rb = fe.plan_bins(HW, HW, KS)
        phi = fe.build_phi(w, mu1, mu2, p1, p2, rb, True,
                           phase_span=KS // 2 + 1, precision=PREC)
        dx = fe.fourier_input_grad(gyb, phi, KS, precision=PREC)
        return keep(g, c) + jnp.sum(dx).astype(c.dtype) * 1e-30

    def fused_withdx(c):
        g, dx = fe.fourier_unit_grads_fused2(
            xbm, c, mu1, mu2, KS, True, precision=PREC,
            err_blur=gyb, w_units=w, gather=GATHER)
        return keep(g, c) + jnp.sum(dx).astype(c.dtype) * 1e-30

    for label, fn in (
            ("unfused     ", lambda c: keep(fe.fourier_unit_grads(
                xbm, c, mu1, mu2, KS, True, precision=PREC), c)),
            ("fused       ", lambda c: keep(fe.fourier_unit_grads_fused2(
                xbm, c, mu1, mu2, KS, True, precision=PREC,
                gather=GATHER), c)),
            ("unfused+dx  ", unfused_withdx),
            ("fused+dx    ", fused_withdx)):
        t = time_chained(fn, err, 30)
        print(f"  {label} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]} gather={GATHER}", flush=True)
    for nm in (sys.argv[1:] or ["conv4"]):
        probe(nm)
