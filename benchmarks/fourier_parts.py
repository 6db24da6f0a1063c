"""Break down the Fourier forward cost at one layer shape (real TPU).

Components: rdft2, build_phi, per-bin matmul (with static Phi), partial
iDFT. Run: python benchmarks/fourier_parts.py [conv4|conv2|conv3]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402
from benchmarks.fourier_probe import SHAPES  # noqa: E402

from dau_convnet_tpu.ops import fourier_engine as fe  # noqa: E402

DTYPE = jnp.bfloat16
N, G, KS = 32, 2, 9


def main(name):
    S, F, HW = SHAPES[name]
    prec = jax.lax.Precision.DEFAULT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    p1, p2, rb = fe.plan_bins(HW, HW, KS)
    b = p1 * rb
    print(f"{name}: S={S} F={F} {HW}x{HW} N={N} -> P={p1}x{p2}, bins={b}")

    def keep(y, like):
        return like + jnp.sum(y).astype(like.dtype) * 0.0

    # 1. rdft2 of x
    t = time_chained(lambda c: keep(jnp.stack(
        fe._rdft2(c, p1, p2, rb, prec)), c), x, 50)
    print(f"  rdft2(x)            {t*1e3:8.3f} ms", flush=True)

    # 2. build_phi (depends on w/mu; chain through w)
    t = time_chained(lambda c: keep(jnp.stack(
        fe.build_phi(c, mu1, mu2, p1, p2, rb)), c), w, 50)
    print(f"  build_phi           {t*1e3:8.3f} ms", flush=True)

    # 3. per-bin matmul with static operands
    xre, xim = fe._rdft2(x, p1, p2, rb, prec)
    phire, phiim = fe.build_phi(w, mu1, mu2, p1, p2, rb)
    xre_t = jnp.transpose(xre, (2, 0, 1))
    xim_t = jnp.transpose(xim, (2, 0, 1))
    pre_t = jnp.transpose(phire, (2, 0, 1))
    pim_t = jnp.transpose(phiim, (2, 0, 1))

    def mm_step(c):
        yre, yim = fe._bin_matmul(c, xim_t, pre_t, pim_t, prec)
        return keep(yre + yim, c)
    t = time_chained(mm_step, xre_t, 50)
    print(f"  per-bin matmul      {t*1e3:8.3f} ms", flush=True)

    # 4. partial iDFT of (B,N,F) f32
    yre, yim = fe._bin_matmul(xre_t, xim_t, pre_t, pim_t, prec)
    cmat, smat = fe._idft_mats(p1, p2, rb, np.arange(HW), np.arange(HW),
                               jnp.float32)

    def idft_step(c):
        a = jnp.transpose(c, (1, 2, 0))
        o = (jnp.matmul(a, cmat, precision=prec)
             - jnp.matmul(jnp.transpose(yim, (1, 2, 0)), smat, precision=prec))
        return keep(o, c)
    t = time_chained(idft_step, yre, 50)
    print(f"  partial iDFT (+T)   {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    main(sys.argv[1] if len(sys.argv) > 1 else "conv4")
