"""Empirical Mosaic capability probe for the round-3 fused-kernel design.

Questions answered on the real chip (each prints PASS/FAIL + timing):
  1. dot_general with a 3D operand (contract K between (P,K) and (K,A,B)).
  2. VMEM headroom: can a kernel hold ~24-40 MB with vmem_limit_bytes raised?
  3. Per-grid-step overhead: trivial-compute kernel at 16 vs 256 grid steps.

Run: python benchmarks/mosaic_probe.py
"""

import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name}  ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}  ({time.time()-t0:.1f}s)",
              flush=True)
        if "--trace" in sys.argv:
            traceback.print_exc()


def t_3d_dot():
    """table(P,A,B) = sum_k D(P,K) @ T(K,A,B)."""
    P, K, A, B = 81, 153, 128, 128
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((P, K)), jnp.bfloat16)
    t = jnp.asarray(rng.standard_normal((K, A, B)), jnp.bfloat16)

    def kern(d_ref, t_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            d_ref[...], t_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((P, A, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, t)
    ref = jnp.einsum("pk,kab->pab", d.astype(jnp.float32), t.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 2e-2, f"mismatch {err}"


def t_3d_dot_batched():
    """out(A,P,B) = batched over A: T(A,K,B) x D(K,P) -> einsum akb,kp->apb."""
    P, K, A, B = 81, 153, 128, 128
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((K, P)), jnp.bfloat16)
    t = jnp.asarray(rng.standard_normal((A, K, B)), jnp.bfloat16)

    def kern(t_ref, d_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            t_ref[...], d_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((A, B, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, d)
    ref = jnp.einsum("akb,kp->abp", t.astype(jnp.float32), d.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 2e-2, f"mismatch {err}"


def t_vmem(total_mb):
    """Hold a ~total_mb scratch + blocks with raised vmem_limit_bytes."""
    n = int(total_mb * 1024 * 1024 / 4 / 512 // 8 * 8)
    x = jnp.ones((n, 512), jnp.float32)

    def kern(x_ref, o_ref, big):
        big[...] = x_ref[...] * 2.0
        o_ref[...] = jnp.sum(big[...], axis=0, keepdims=True)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, 512), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((2 * total_mb + 8) * 1024 * 1024)),
    )(x)
    assert float(out[0, 0]) == 2.0 * n


def t_grid_overhead():
    """Same total work split over 16 vs 256 grid steps."""
    M, N = 256 * 128, 512
    x = jnp.ones((M, N), jnp.bfloat16)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.bfloat16(1.0)

    def run(steps):
        blk = M // steps
        f = pl.pallas_call(
            kern,
            grid=(steps,),
            in_specs=[pl.BlockSpec((blk, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        )
        def step(c):
            y = f(c)
            return c + jnp.sum(y).astype(c.dtype) * 1e-30
        return time_chained(step, x, 30)

    t16 = run(16)
    t256 = run(256)
    over = (t256 - t16) / (256 - 16)
    print(f"  grid 16 steps: {t16*1e3:.3f} ms, 256 steps: {t256*1e3:.3f} ms "
          f"-> per-step overhead ~{over*1e6:.2f} us", flush=True)


def t_batched_dot():
    """Per-bin batched matmul: (B,M,K) x (B,K,N) batch dim 0."""
    Bb, Mm, K, Nn = 153, 384, 64, 128
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((Bb, Mm, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((Bb, K, Nn)), jnp.bfloat16)

    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Bb, Mm, Nn), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b)
    ref = jnp.einsum("bmk,bkn->bmn", a.astype(jnp.float32), b.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 2e-2, f"mismatch {err}"


def t_batched_dot_4d():
    """Batched matmul with an extra lhs free dim: (B,M,S,K) x (B,K,N)."""
    Bb, Mm, Ss, K, Nn = 153, 3, 128, 64, 128
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((Bb, Mm, Ss, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((Bb, K, Nn)), jnp.bfloat16)

    def kern(a_ref, b_ref, o_ref):
        av = a_ref[...].reshape(Bb, Mm * Ss, K)
        o_ref[...] = jax.lax.dot_general(
            av, b_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(Bb, Mm, Ss, Nn)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Bb, Mm, Ss, Nn), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b)
    ref = jnp.einsum("bmsk,bkn->bmsn", a.astype(jnp.float32), b.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 2e-2, f"mismatch {err}"


def t_gather_loop():
    """fori_loop one-hot tap gather over a (P, M, S, F) table in VMEM."""
    P, Mm, Ss, Ff, G = 81, 3, 128, 128, 2
    ks = 9
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((P, Mm, Ss, Ff)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, P - ks - 1, (Ss, G, Ff)), jnp.float32)
    iw = jnp.asarray(rng.random((Ss, G, Ff)), jnp.float32)

    def kern(tab_ref, tgt_ref, iw_ref, o_ref):
        tgtv = tgt_ref[...]
        iwv = iw_ref[...]

        def body(p, acc):
            maskp = jnp.where(tgtv == p, iwv, 0.0)
            slab = jax.lax.dynamic_index_in_dim(tab_ref[...], p, 0,
                                                keepdims=False)
            return acc + maskp[None, :, :, None] * slab[:, :, None, :]

        o_ref[...] = jax.lax.fori_loop(
            0, P, body, jnp.zeros((Mm, Ss, G, Ff), jnp.float32))

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Mm, Ss, G, Ff), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab, tgt, iw)
    pidx = np.arange(P).reshape(P, 1, 1, 1)
    mask = np.where(np.asarray(tgt)[None] == pidx, np.asarray(iw)[None], 0.0)
    ref = jnp.einsum("psgf,pmsf->msgf", jnp.asarray(mask), tab)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-4, f"mismatch {err}"


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else None
    tests = [
        ("3d_dot (P,K)x(K,A,B)", t_3d_dot),
        ("3d_dot (A,K,B)x(K,P)", t_3d_dot_batched),
        ("batched_dot (B,M,K)x(B,K,N)", t_batched_dot),
        ("batched_dot_4d (B,M,S,K)x(B,K,N)", t_batched_dot_4d),
        ("gather_loop", t_gather_loop),
        ("vmem 60 MB scratch", lambda: t_vmem(60)),
        ("grid overhead", t_grid_overhead),
    ]
    for name, fn in tests:
        if only and only not in name:
            continue
        check(name, fn)
