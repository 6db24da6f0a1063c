"""Benchmark: DAU layer fwd+bwd throughput vs an equivalent plain conv.

Reproduces the reference's own perf harness (`test_DAUConvSpeedTest`,
plugins/tensorflow/tests/dau_conv_test.py:504-628): one DAU layer with
2x1 units, k=9 on N=32, S=128, 16x16 -> F=32, fwd+bwd, timed against a
3x3 conv2d of the same shape. Prints ONE JSON line; `vs_baseline` is
DAU throughput / conv throughput (>= 1.0 meets the north star
"DAU fwd+bwd >= conv-equivalent images/sec", BASELINE.md).

Run on the real TPU chip: `python bench.py`.
Options: --dtype bf16|f32 (default f32), --precision default|highest.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def time_step(fn, args, iters=100, warmup=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--S", type=int, default=128)
    ap.add_argument("--F", type=int, default=32)
    ap.add_argument("--HW", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--engine", default="xla", choices=["xla", "pallas"])
    args = ap.parse_args()

    from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    N, S, F, HW = args.N, args.S, args.F, args.HW
    G = 2  # dau_units (2, 1), reference speedtest config
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), dtype)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), dtype)
    w = jnp.asarray(rng.standard_normal((1, S, G, F)) * 0.1, dtype)
    bound = 4 - 0.01
    mu1 = jnp.asarray(rng.uniform(-3, 3, (1, S, G, F)), dtype)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (1, S, G, F)), dtype)
    sigma = jnp.full((1, S, G, F), 0.5, dtype)

    cfg = DAUConvSettings(kernel_size=9, mu_learning_rate_factor=1.0,
                          engine=args.engine)

    @jax.jit
    def dau_step(x, w, mu1, mu2, sigma, err):
        def f(x, w, mu1, mu2, sigma):
            y = dau_conv2d_op(cfg, x, jnp.clip(w, -1e9, 1e9),
                              jnp.clip(mu1, -bound, bound),
                              jnp.clip(mu2, -bound, bound), sigma)
            return jnp.vdot(y, err)
        l, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(x, w, mu1, mu2, sigma)
        return l, grads

    # baseline: plain 3x3 conv, fwd+bwd on identical shapes
    k3 = jnp.asarray(rng.standard_normal((F, S, 3, 3)) * 0.1, dtype)

    @jax.jit
    def conv_step(x, k3, err):
        def f(x, k3):
            y = jax.lax.conv_general_dilated(
                x, k3, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return jnp.vdot(y, err)
        l, grads = jax.value_and_grad(f, argnums=(0, 1))(x, k3)
        return l, grads

    t_dau = time_step(dau_step, (x, w, mu1, mu2, sigma, err), args.iters)
    t_conv = time_step(conv_step, (x, k3, err), args.iters)

    ips = N / t_dau
    print(json.dumps({
        "metric": f"dau_layer_fwdbwd_images_per_sec(N{N},S{S},{HW}x{HW},F{F},2x1units,k9,{args.dtype},{args.engine})",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(t_conv / t_dau, 4),
        "detail": {
            "dau_ms": round(t_dau * 1e3, 4),
            "conv3x3_ms": round(t_conv * 1e3, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
