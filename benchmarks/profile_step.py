"""Whole-step budget profile of the AlexNet-DAU training step (real TPU).

Times each component of one DAU layer (blur / synthesize+fwd-conv / dx /
grad-tables / tap-gather) at every AlexNet layer shape with the chained-scan
methodology, plus the shared stem+fc+optimizer cost, so the 15.9 ms step
(BENCH_r01) can be attributed. Run on the real chip: python
benchmarks/profile_step.py
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import time_chained  # noqa: E402

from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op  # noqa: E402
from dau_convnet_tpu.ops import xla_engine  # noqa: E402
from dau_convnet_tpu.ops.gaussian import depthwise_blur, gaussian_filters  # noqa: E402

DTYPE = jnp.bfloat16
N = 32
# AlexNet-DAU layer shapes (default variant, 227x227 input)
LAYERS = [
    ("conv2", 96, 256, 27),
    ("conv3", 256, 384, 13),
    ("conv4", 384, 384, 13),
    ("conv5", 384, 256, 13),
]
G = 2
KS = 9

def timed(name, make_step, carry, iters=60):
    t = time_chained(make_step, carry, iters)
    print(f"  {name:34s} {t * 1e3:8.3f} ms")
    return t

def layer_profile(name, S, F, HW):
    print(f"{name}: S={S} F={F} {HW}x{HW} N={N} G={G} ks={KS} bf16")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), DTYPE)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), DTYPE)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    prec = jax.lax.Precision.DEFAULT
    filts = {k: v.astype(DTYPE) for k, v in gaussian_filters(
        jnp.float32(0.5), 9).items()}
    fstack = jnp.stack([filts["w"], filts["dmu1"], filts["dmu2"]])

    res = {}

    # 1. forward blur (1 filter / channel)
    def blur_step(c):
        return depthwise_blur(c, filts["w"], precision=prec)
    res["blur_fwd"] = timed("blur fwd (depthwise, 1 filt)", blur_step, x)

    # 2. M=3 derivative blur
    def blur3_step(c):
        out = depthwise_blur(c, fstack, precision=prec)
        return out[:, ::3]  # keep carry shape
    res["blur_m3"] = timed("blur M=3 (depthwise)", blur3_step, x)

    # 3. synthesize + fwd aggregation conv
    def fwd_step(c):
        return xla_engine.aggregate_forward(c, w, mu1, mu2, KS, True,
                                            precision=prec)[:, :S]
    # F >= S for all layers except conv5; slice to keep carry shape
    if F >= S:
        res["fwd_agg"] = timed("fwd agg (synth + conv)", fwd_step, x)
    else:
        def fwd_step2(c):
            y = xla_engine.aggregate_forward(c, w, mu1, mu2, KS, True,
                                             precision=prec)
            return jnp.pad(y, ((0, 0), (0, S - F), (0, 0), (0, 0)))
        res["fwd_agg"] = timed("fwd agg (synth + conv)", fwd_step2, x)

    # 4. input grad: fwd engine, transposed params
    wT = jnp.transpose(w, (2, 1, 0))
    m1T = -jnp.transpose(mu1, (2, 1, 0))
    m2T = -jnp.transpose(mu2, (2, 1, 0))

    def dx_step_ok(c):
        y = xla_engine.aggregate_forward(c, wT, m1T, m2T, KS, True,
                                         precision=prec)  # (N, S, H, W)
        return y[:, :F] if S >= F else jnp.pad(y, ((0, 0), (0, F - S), (0, 0), (0, 0)))
    res["dx_agg"] = timed("dx agg (transposed fwd)", dx_step_ok, err)

    # 5. grad tables (M=3)
    xb3 = depthwise_blur(x, fstack, precision=prec)
    xb3 = jnp.transpose(xb3.reshape(N, S, 3, HW, HW), (2, 0, 1, 3, 4))

    def table_step(c):
        t = xla_engine.grad_tables(xb3, c, KS, precision=prec)
        # fold the table back into a same-shaped carry perturbation
        return c + jnp.sum(t).astype(c.dtype) * 1e-30
    res["tables"] = timed("grad tables (M=3 conv)", table_step, err)

    # 6. tap gather
    table = xla_engine.grad_tables(xb3, err, KS, precision=prec)

    def gather_step(c):
        g = xla_engine.tap_gather(c, mu1, mu2, KS, True)
        return c + jnp.sum(g).astype(c.dtype) * 1e-30
    res["tap_gather"] = timed("tap gather", gather_step, table)

    # 7. whole layer fwd+bwd via custom_vjp (end-to-end check)
    cfg = DAUConvSettings(kernel_size=9, compute_sigma_grad=False,
                          precision="default")
    sigma = jnp.full((1,), 0.5, DTYPE)
    w4, mu14, mu24 = w[None], mu1[None], mu2[None]

    def layer_step(c):
        def f(x):
            y = dau_conv2d_op(cfg, x, w4, mu14, mu24, sigma)
            return jnp.vdot(y, err)
        _, dx = jax.value_and_grad(f)(c)
        return c - 1e-6 * dx
    res["layer_total"] = timed("whole layer fwd+bwd (custom_vjp)", layer_step, x)

    flops = {
        "fwd_agg": 2 * N * S * F * HW * HW * KS * KS,
        "dx_agg": 2 * N * S * F * HW * HW * KS * KS,
        "tables": 3 * 2 * N * S * F * HW * HW * KS * KS,
    }
    for k, fl in flops.items():
        eff = fl / res[k] / 197e12 * 100
        print(f"  {k:16s} {fl / 1e9:7.1f} GFLOP  -> {eff:5.1f}% of bf16 peak")
    return res

def shared_cost():
    """Stem + fc + optimizer cost proxy: the conv3x3 baseline minus its
    conv FLOPs is dominated by the same shared parts."""
    print("shared parts proxy: see conv3x3_step_ms in bench output")

if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    totals = {}
    for name, S, F, HW in LAYERS:
        r = layer_profile(name, S, F, HW)
        for k, v in r.items():
            totals[k] = totals.get(k, 0.0) + v
    print("\nper-component totals over the 4 DAU layers (ms):")
    for k, v in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v * 1e3:8.3f}")
    print(json.dumps({k: round(v * 1e3, 3) for k, v in totals.items()}))
