"""Per-component fourier-engine budget at AlexNet-DAU layer shapes.

Originally the round-2 attribution of the 11.67 ms step; now also the
G=4 (large-variant) budget tool the round-3 verdict asked for (item 4).
Run on the real chip:
    python benchmarks/budget_r2.py [--g 4] [conv2 conv3 conv4 conv5]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402

from dau_convnet_tpu.ops import fourier_engine as fe  # noqa: E402
from dau_convnet_tpu.ops.gaussian import depthwise_blur, gaussian_filters  # noqa: E402

DTYPE = jnp.bfloat16
N, G, KS, M = 32, 2, 9, 3
if "--g" in sys.argv:
    _i = sys.argv.index("--g")
    G = int(sys.argv[_i + 1])
    del sys.argv[_i:_i + 2]
PREC = jax.lax.Precision.DEFAULT
SHAPES = {"conv2": (96, 256, 27), "conv3": (256, 384, 13),
          "conv4": (384, 384, 13), "conv5": (384, 256, 13)}
LAYERS = [(nm,) + SHAPES[nm] for nm in (sys.argv[1:] or ["conv2", "conv4"])]


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    totals = {}
    for name, S, F, HW in LAYERS:
        print(f"{name}: S={S} F={F} {HW}x{HW}")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
        err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
        w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
        mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
        mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
        xbm = jnp.stack([x, x * 0.5, -x])
        p1, p2, rb = fe.plan_bins(HW, HW, KS)
        filts = gaussian_filters(jnp.float32(0.5), size=9)
        fstack = jnp.stack([filts[k] for k in ("w", "dmu1", "dmu2")]).astype(DTYPE)

        def keep(y, like):
            return like + jnp.sum(y).astype(like.dtype) * 1e-30

        def timed(label, step, carry, iters=30):
            t = time_chained(step, carry, iters)
            totals.setdefault(label, 0.0)
            totals[label] += t
            print(f"  {label:28s} {t*1e3:8.3f} ms", flush=True)
            return t

        # forward pieces
        timed("blur", lambda c: keep(depthwise_blur(
            c, filts["w"].astype(DTYPE), precision=PREC), c), x)
        timed("phi_build", lambda c: keep(jnp.stack(fe.build_phi(
            c, mu1, mu2, p1, p2, rb)), c), w)
        phi = fe.build_phi(w, mu1, mu2, p1, p2, rb)
        timed("fwd_apply(X dft+mm+idft)", lambda c: keep(fe.fourier_apply_phi(
            c, phi[0], phi[1], HW, HW, p1, p2, rb, PREC), c), x)
        timed("dx_apply", lambda c: keep(fe.fourier_apply_phi(
            c, phi[0], phi[1], HW, HW, p1, p2, rb, PREC,
            contract_f=True), c), err)
        # backward pieces
        timed("mblur(M=3)", lambda c: keep(depthwise_blur(
            c, fstack, precision=PREC), c), x)
        timed("cross_spectra", lambda c: keep(jnp.stack(fe.fourier_cross_spectra(
            c, err, KS, PREC)[:2]), c), xbm)
        tre, tim, _ = fe.fourier_cross_spectra(xbm, err, KS, PREC)
        timed("spectral_gather", lambda c: keep(fe._spectral_gather(
            c, tim, mu1, mu2, p1, p2, rb, True), c), tre)
        timed("unit_grads(all bwd)", lambda c: keep(fe.fourier_unit_grads(
            xbm, c, mu1, mu2, KS, True, precision=PREC), c), err)
    print(f"\nper-step totals over the {len(LAYERS)} layers (ms), G={G}:")
    for k, v in totals.items():
        print(f"  {k:28s} {v*1e3:8.3f}")


if __name__ == "__main__":
    main()
