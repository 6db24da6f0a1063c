"""Dissect fourier_grad_tables v3 at conv4 (real TPU)."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402
from benchmarks.fourier_probe import SHAPES  # noqa: E402

from dau_convnet_tpu.ops import fourier_engine as fe  # noqa: E402

DTYPE = jnp.bfloat16
N, G, KS, M = 32, 2, 9, 3


def main(name):
    S, F, HW = SHAPES[name]
    prec = jax.lax.Precision.DEFAULT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    xbm = jnp.stack([x, x * 0.5, -x])
    p1, p2, rb = fe.plan_bins(HW, HW, KS)
    b = p1 * rb
    print(f"{name}: S={S} F={F} {HW}x{HW} -> bins={b}")

    def keep(y, like):
        return like + jnp.sum(y).astype(like.dtype) * 1e-30

    def timed(label, step, carry):
        t = time_chained(step, carry, 50)
        print(f"  {label:38s} {t*1e3:8.3f} ms", flush=True)
        return t

    xre, xim = fe._rdft2(xbm, p1, p2, rb, prec)
    ere, eim = fe._rdft2(err, p1, p2, rb, prec)
    xs0 = jnp.concatenate([xre, xim], axis=1)
    es_re = jnp.concatenate([ere, eim], axis=0)
    es_im = jnp.concatenate([-eim, ere], axis=0)
    dn = (((1,), (0,)), ((3,), (2,)))

    timed("concat xs+es", lambda c: keep(
        jnp.concatenate([c, xim], axis=1), c), xre)

    def mm_only(c):
        t_re = jax.lax.dot_general(c, es_re, dn, precision=prec,
                                   preferred_element_type=jnp.float32).astype(DTYPE)
        t_im = jax.lax.dot_general(c, es_im, dn, precision=prec,
                                   preferred_element_type=jnp.float32).astype(DTYPE)
        return keep(t_re + t_im, c)
    timed("stacked mm -> bf16 (B,M,S,F)", mm_only, xs0)

    tre = jax.lax.dot_general(xs0, es_re, dn, precision=prec,
                              preferred_element_type=jnp.float32).astype(DTYPE)
    tim = jax.lax.dot_general(xs0, es_im, dn, precision=prec,
                              preferred_element_type=jnp.float32).astype(DTYPE)
    c_ = KS // 2
    pos = np.arange(-c_, c_ + 1)
    cmat, smat = fe._idft_mats(p1, p2, rb, pos, pos, DTYPE)
    dn2 = (((1,), (0,)), ((), ()))

    def idft_kmajor(c, out_bf16):
        t1 = jax.lax.dot_general(cmat.T, c.reshape(b, -1), dn2, precision=prec,
                                 preferred_element_type=jnp.float32)
        t2 = jax.lax.dot_general(smat.T, tim.reshape(b, -1), dn2, precision=prec,
                                 preferred_element_type=jnp.float32)
        o = t1 - t2
        if out_bf16:
            o = o.astype(DTYPE)
        return keep(o, c)
    timed("idft dot(D^T, That) f32 out", lambda c: idft_kmajor(c, False), tre)
    timed("idft dot(D^T, That) bf16 out", lambda c: idft_kmajor(c, True), tre)

    # variant: contract trailing B via batched-free dot with rhs (B,81):
    # out (M,S,F,81) - uses tre2 (M,S,F,B) requiring the mm output batch last
    # (not available); skip.

    # variant: idft via matmul on (MSF, B) after explicit transpose
    def idft_transpose(c):
        t = jnp.transpose(c.reshape(b, -1), (1, 0))
        o = jax.lax.dot_general(t, cmat, dn2, precision=prec,
                                preferred_element_type=jnp.float32)
        return keep(o, c)
    timed("idft transpose+ (MSF,B)@(B,81)", idft_transpose, tre)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    main(sys.argv[1] if len(sys.argv) > 1 else "conv4")
