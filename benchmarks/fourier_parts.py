"""Component breakdown of the Fourier engine at one layer shape (real TPU).

Run: python benchmarks/fourier_parts.py [conv4|conv2|conv3]
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


def build_phi_unrolled(w, mu1, mu2, p1, p2, rb):
    """Explicit g-term sum (no jnp.sum reduce) - fusion experiment."""
    s, g, f = w.shape
    dtype = w.dtype
    pyre, pyim = fe._tap_phase(mu2, p1, p1, True, dtype)
    pxre, pxim = fe._tap_phase(mu1, p2, rb, True, dtype)
    terms_re, terms_im = [], []
    for gi in range(g):
        wb = w[:, gi, :]                       # (S,F)
        yre = jnp.transpose(pyre[:, gi], (2, 0, 1))[:, None]   # (P1,1,S,F)
        yim = jnp.transpose(pyim[:, gi], (2, 0, 1))[:, None]
        xre = jnp.transpose(pxre[:, gi], (2, 0, 1))[None]      # (1,rb,S,F)
        xim = jnp.transpose(pxim[:, gi], (2, 0, 1))[None]
        terms_re.append(wb * (yre * xre - yim * xim))
        terms_im.append(wb * (yre * xim + yim * xre))
    phire = terms_re[0]
    phiim = terms_im[0]
    for t_re, t_im in zip(terms_re[1:], terms_im[1:]):
        phire = phire + t_re
        phiim = phiim + t_im
    return phire.reshape(p1 * rb, s, f), phiim.reshape(p1 * rb, s, f)


def main(name):
    S, F, HW = SHAPES[name]
    prec = jax.lax.Precision.DEFAULT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    xbm = jnp.stack([x, x * 0.5, -x])
    p1, p2, rb = fe.plan_bins(HW, HW, KS)
    b = p1 * rb
    M = 3
    print(f"{name}: S={S} F={F} {HW}x{HW} N={N} -> P={p1}x{p2}, bins={b}")

    def keep(y, like):
        return like + jnp.sum(y).astype(like.dtype) * 1e-30

    def timed(label, step, carry):
        t = time_chained(step, carry, 50)
        print(f"  {label:26s} {t*1e3:8.3f} ms", flush=True)
        return t

    timed("build_phi (v2 sum)", lambda c: keep(jnp.stack(
        fe.build_phi(c, mu1, mu2, p1, p2, rb)), c), w)
    timed("build_phi (unrolled)", lambda c: keep(jnp.stack(
        build_phi_unrolled(c, mu1, mu2, p1, p2, rb)), c), w)

    # tables sub-parts
    timed("rdft2(xbm M=3)", lambda c: keep(jnp.stack(
        fe._rdft2(c, p1, p2, rb, prec)), c), xbm)

    xre, xim = fe._rdft2(xbm, p1, p2, rb, prec)
    ere, eim = fe._rdft2(err, p1, p2, rb, prec)
    xre_t = jnp.transpose(xre, (3, 0, 2, 1)).reshape(-1, M * S, N)
    xim_t = jnp.transpose(xim, (3, 0, 2, 1)).reshape(-1, M * S, N)
    ere_t = jnp.transpose(ere, (2, 0, 1))
    eim_t = jnp.transpose(eim, (2, 0, 1))

    def t_mm(c, out_dtype):
        tre, tim = fe._bin_matmul(c, xim_t, ere_t, eim_t, prec,
                                  conj_b=True, out_dtype=out_dtype)
        return keep(tre + tim.astype(tre.dtype), c)

    timed("tables transposes", lambda c: keep(
        jnp.transpose(c, (3, 0, 2, 1)).reshape(-1, M * S, N), c), xre)
    timed("tables bin-mm (bf16 out)", lambda c: t_mm(c, DTYPE), xre_t)
    timed("tables bin-mm (f32 out)", lambda c: t_mm(c, jnp.float32), xre_t)

    tre, tim = fe._bin_matmul(xre_t, xim_t, ere_t, eim_t, prec,
                              conj_b=True, out_dtype=DTYPE)
    c_ = KS // 2
    pos = np.arange(-c_, c_ + 1)
    cmat, smat = fe._idft_mats(p1, p2, rb, pos, pos, DTYPE)
    dn = (((1,), (0,)), ((), ()))

    def idft_step(c):
        a = jnp.transpose(c, (1, 2, 0)).reshape(-1, b)
        bmat = jnp.transpose(tim, (1, 2, 0)).reshape(-1, b)
        t1 = jax.lax.dot_general(a, cmat, dn, precision=prec,
                                 preferred_element_type=jnp.float32)
        t2 = jax.lax.dot_general(bmat, smat, dn, precision=prec,
                                 preferred_element_type=jnp.float32)
        return keep(t1 - t2, c)
    timed("tables idft (+T)", idft_step, tre)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    main(sys.argv[1] if len(sys.argv) > 1 else "conv4")
