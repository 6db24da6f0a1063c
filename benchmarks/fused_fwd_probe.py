"""Fused fwd/dx Pallas kernel vs unfused fourier chain, real TPU, bf16.

The unfused comparator includes the phi build (the fused kernel rebuilds
phases in-kernel, so the comparison is whole-chain to whole-chain).

Run: python benchmarks/fused_fwd_probe.py [conv2 conv3 conv4 conv5]
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
N, G, KS = 32, 2, 9
PREC = jax.lax.Precision.DEFAULT
SHAPES = {"conv2": (96, 256, 27), "conv3": (256, 384, 13),
          "conv4": (384, 384, 13), "conv5": (384, 256, 13)}


def keep(y, like):
    return like + jnp.sum(y).astype(like.dtype) * 1e-30


def probe(name):
    S, F, HW = SHAPES[name]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
    p1, p2, rb = fe.plan_bins(HW, HW, KS)
    print(f"{name}: S={S} F={F} {HW}x{HW}", flush=True)

    t0 = time.time()
    a = jax.jit(lambda: fe.fourier_forward(x, w, mu1, mu2, KS, True,
                                           precision=PREC))()
    b = jax.jit(lambda: fe.fourier_apply_phi_fused(x, w, mu1, mu2, KS, True,
                                                   precision=PREC))()
    rel = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                / (float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9))
    print(f"  fwd rel diff {rel:.2e}  (compile+run {time.time()-t0:.0f}s)",
          flush=True)
    assert rel < 3e-2, rel

    def unfused_fwd(c):
        # whole chain incl. phi build (the fused kernel rebuilds in-kernel)
        return keep(fe.fourier_forward(
            c, w, mu1, mu2, KS, True, precision=PREC,
            phi=fe.build_phi(w.astype(c.dtype), mu1, mu2, p1, p2, rb,
                             phase_span=KS // 2 + 1, precision=PREC)), c)

    def fused_fwd(c):
        return keep(fe.fourier_apply_phi_fused(c, w, mu1, mu2, KS, True,
                                               precision=PREC), c)

    def unfused_dx(c):
        phi = fe.build_phi(w.astype(c.dtype), mu1, mu2, p1, p2, rb,
                           phase_span=KS // 2 + 1, precision=PREC)
        return keep(fe.fourier_input_grad(c, phi, KS, precision=PREC), c)

    def fused_dx(c):
        return keep(fe.fourier_apply_phi_fused(c, w, mu1, mu2, KS, True,
                                               precision=PREC,
                                               contract_f=True), c)

    for label, fn, carry in (("unfused fwd+phi", unfused_fwd, x),
                             ("fused fwd      ", fused_fwd, x),
                             ("unfused dx+phi ", unfused_dx, err),
                             ("fused dx       ", fused_dx, err)):
        t = time_chained(fn, carry, 30)
        print(f"  {label} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for nm in (sys.argv[1:] or ["conv4"]):
        probe(nm)
