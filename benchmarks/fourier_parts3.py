"""Round 3 probes: transpose-free table contractions + blur costs (real TPU).

Run: python benchmarks/fourier_parts3.py [conv4|conv2]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402
from benchmarks.fourier_probe import SHAPES  # noqa: E402

from dau_convnet_tpu.ops import fourier_engine as fe  # noqa: E402
from dau_convnet_tpu.ops.gaussian import depthwise_blur, gaussian_filters  # noqa: E402

DTYPE = jnp.bfloat16
N, G, KS = 32, 2, 9
M = 3


def main(name):
    S, F, HW = SHAPES[name]
    prec = jax.lax.Precision.DEFAULT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    xbm = jnp.stack([x, x * 0.5, -x])
    p1, p2, rb = fe.plan_bins(HW, HW, KS)
    b = p1 * rb
    print(f"{name}: S={S} F={F} {HW}x{HW} N={N} -> bins={b}")

    def keep(y, like):
        return like + jnp.sum(y).astype(like.dtype) * 1e-30

    def timed(label, step, carry):
        t = time_chained(step, carry, 50)
        print(f"  {label:34s} {t*1e3:8.3f} ms", flush=True)
        return t

    xre, xim = fe._rdft2(xbm, p1, p2, rb, prec)   # (M,N,S,B)
    ere, eim = fe._rdft2(err, p1, p2, rb, prec)   # (N,F,B)

    # A. in-place batched cross-spectrum: contract N, batch B, no transposes
    #    lhs (M,N,S,B) c-dim 1, b-dim 3; rhs (N,F,B) c-dim 0, b-dim 2
    dn_a = (((1,), (0,)), ((3,), (2,)))

    def mm_inplace(c, out_dtype=DTYPE):
        t_re = (jax.lax.dot_general(c, ere, dn_a, precision=prec,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(xim, eim, dn_a, precision=prec,
                                      preferred_element_type=jnp.float32))
        t_im = (jax.lax.dot_general(xim, ere, dn_a, precision=prec,
                                    preferred_element_type=jnp.float32)
                - jax.lax.dot_general(c, eim, dn_a, precision=prec,
                                      preferred_element_type=jnp.float32))
        return t_re.astype(out_dtype), t_im.astype(out_dtype)  # (B,M,S,F)

    timed("tables mm in-place (bf16)", lambda c: keep(
        jnp.stack(mm_inplace(c)), c), xre)

    # B. same + leading-dim-contraction iDFT (no transpose of That)
    c_ = KS // 2
    pos = np.arange(-c_, c_ + 1)
    cmat, smat = fe._idft_mats(p1, p2, rb, pos, pos, DTYPE)
    dn_b = (((0,), (0,)), ((), ()))  # contract leading B

    def full_tables(c):
        t_re, t_im = mm_inplace(c)
        tab = (jax.lax.dot_general(t_re, cmat, dn_b, precision=prec,
                                   preferred_element_type=jnp.float32)
               - jax.lax.dot_general(t_im, smat, dn_b, precision=prec,
                                     preferred_element_type=jnp.float32))
        return keep(tab, c)  # (M,S,F,81)

    timed("tables full (in-place+lead-idft)", full_tables, xre)

    # C. stacked re/im -> one K=2N contraction for the real part trick
    xstack = jnp.concatenate([xre, xim], axis=1)           # (M,2N,S,B)
    estack_re = jnp.concatenate([ere, eim], axis=0)        # (2N,F,B)
    estack_im = jnp.concatenate([eim, -ere], axis=0)

    def mm_stacked(c):
        t_re = jax.lax.dot_general(c, estack_re, dn_a, precision=prec,
                                   preferred_element_type=jnp.float32)
        t_im = jax.lax.dot_general(c, estack_im, dn_a, precision=prec,
                                   preferred_element_type=jnp.float32)
        return keep(t_re.astype(DTYPE) + t_im.astype(DTYPE), c)

    timed("tables mm stacked K=2N (bf16)", mm_stacked, xstack)

    # D. fwd bin-mm in-place (contract S): lhs X (N,S,B) c 1 b 2;
    #    rhs Phi (B,S,F) c 1 b 0 -> out (B,N,F)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    phire, phiim = fe.build_phi(w, mu1, mu2, p1, p2, rb)
    xre1, xim1 = fe._rdft2(x, p1, p2, rb, prec)  # (N,S,B)
    dn_d = (((1,), (1,)), ((2,), (0,)))

    def fwd_inplace(c):
        yre = (jax.lax.dot_general(c, phire, dn_d, precision=prec,
                                   preferred_element_type=jnp.float32)
               - jax.lax.dot_general(xim1, phiim, dn_d, precision=prec,
                                     preferred_element_type=jnp.float32))
        return keep(yre, c)

    timed("fwd mm in-place (2 of 4 mms)", fwd_inplace, xre1)

    # E. blur costs
    filts = {k: v.astype(DTYPE) for k, v in
             gaussian_filters(jnp.float32(0.5), 9).items()}
    fstack = jnp.stack([filts["w"], filts["dmu1"], filts["dmu2"]])
    timed("blur 1-filt depthwise", lambda c: keep(
        depthwise_blur(c, filts["w"], precision=prec), c), x)
    timed("blur M=3 depthwise", lambda c: keep(
        depthwise_blur(c, fstack, precision=prec), c), x)

    # F. separable blur (two rank-1 passes)
    g1 = jnp.asarray(np.exp(-((np.arange(9) - 4.0) ** 2) / (2 * 0.25)), DTYPE)

    def sep_blur(c):
        # horizontal pass as conv with (1,9) then vertical with (9,1)
        fh = g1.reshape(1, 9)
        fv = g1.reshape(9, 1)
        o = depthwise_blur(c, fh, precision=prec)
        o = depthwise_blur(o, fv, precision=prec)
        return keep(o, c)

    timed("blur separable 1-filt", sep_blur, x)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    main(sys.argv[1] if len(sys.argv) > 1 else "conv4")
