"""Per-component budget of the fourier production layer at AlexNet shapes
(real TPU, bf16). Attributes the whole-step time to: blur, phi build,
fwd apply, dx apply, unit-grads (cross + spectral gather), whole layer.

Run: python benchmarks/profile_fourier.py [conv2 conv3 conv4 conv5]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402

from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op  # noqa: E402
from dau_convnet_tpu.ops import fourier_engine as fe  # noqa: E402

DTYPE = jnp.bfloat16
N, G, KS, M = 32, 2, 9, 3
PREC = jax.lax.Precision.DEFAULT
LAYERS = {"conv2": (96, 256, 27), "conv3": (256, 384, 13),
          "conv4": (384, 384, 13), "conv5": (384, 256, 13)}


def timed(name, make_step, carry, iters=40):
    t = time_chained(make_step, carry, iters)
    print(f"  {name:34s} {t * 1e3:8.3f} ms", flush=True)
    return t


def keep(y, like):
    return like + jnp.sum(y).astype(like.dtype) * 1e-30


def profile(name):
    S, F, HW = LAYERS[name]
    print(f"{name}: S={S} F={F} {HW}x{HW} N={N} G={G} ks={KS} bf16",
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
    xbm = jnp.stack([x, x * 0.5, -x])
    p1, p2, rb = fe.plan_bins(HW, HW, KS)
    span = KS // 2 + 1
    total = 0.0

    total += timed("phi build (tables)", lambda c: keep(jnp.stack(
        fe.build_phi(c, mu1, mu2, p1, p2, rb, phase_span=span,
                     precision=PREC)), c), w)

    phi = fe.build_phi(w, mu1, mu2, p1, p2, rb, phase_span=span,
                       precision=PREC)

    def fwd_step(c):
        y = fe.fourier_apply_phi(c, phi[0], phi[1], HW, HW, p1, p2, rb, PREC)
        return keep(y, c)
    total += timed("fwd apply_phi", fwd_step, x)

    def dx_step(c):
        y = fe.fourier_apply_phi(c, phi[0], phi[1], HW, HW, p1, p2, rb, PREC,
                                 contract_f=True)
        return keep(y, c)
    total += timed("dx apply_phi (conj, F-contract)", dx_step, err)

    total += timed("unit grads (cross+gather)", lambda c: keep(
        fe.fourier_unit_grads(xbm, c, mu1, mu2, KS, True, precision=PREC),
        c), err, iters=30)

    # cross alone for attribution
    timed("  cross-spectra alone", lambda c: keep(jnp.stack(
        fe.fourier_cross_spectra(xbm, c, KS, PREC)[:2]), c), err, iters=30)

    cfg = DAUConvSettings(kernel_size=9, compute_sigma_grad=False,
                          precision="default", engine="fourier")
    sigma = jnp.full((1,), 0.5, DTYPE)
    w4, mu14, mu24 = w[None], mu1[None].astype(DTYPE), mu2[None].astype(DTYPE)

    def layer_step(c):
        # grads w.r.t. ALL inputs - differentiating only x lets XLA DCE the
        # whole unit-gradient path out of the custom_vjp bwd rule
        def f(x, w4, mu14, mu24):
            y = dau_conv2d_op(cfg, x, w4, mu14, mu24, sigma)
            return jnp.vdot(y, err)
        _, (dx, dw, dm1, dm2) = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
            c, w4, mu14, mu24)
        return (c - 1e-6 * dx
                + (jnp.sum(dw) + jnp.sum(dm1) + jnp.sum(dm2)).astype(c.dtype)
                * 1e-30)
    t_layer = timed("whole layer fwd+bwd (custom_vjp)", layer_step, x)
    print(f"  {'sum of components':34s} {total * 1e3:8.3f} ms "
          f"(layer includes blurs/finalize not itemized)", flush=True)
    return t_layer


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    tot = 0.0
    for nm in (sys.argv[1:] or list(LAYERS)):
        tot += profile(nm)
    print(f"4-layer fwd+bwd total: {tot * 1e3:.3f} ms", flush=True)
