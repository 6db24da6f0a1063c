"""Phi-build strategies at one layer shape (real TPU).

Run: python benchmarks/phi_probe.py [conv4|conv2]
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
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, DTYPE)
    mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), DTYPE)
    p1, p2, rb = fe.plan_bins(HW, HW, KS)
    print(f"{name}: S={S} F={F} -> ({p1 * rb}, {S}, {F}) phi")

    def keep(y, like):
        return like + jnp.sum(y).astype(like.dtype) * 1e-30

    def timed(label, step, carry):
        t = time_chained(step, carry, 50)
        print(f"  {label:30s} {t*1e3:8.3f} ms", flush=True)

    timed("build_phi XLA (bin-leading)", lambda c: keep(jnp.stack(
        fe.build_phi(c, mu1, mu2, p1, p2, rb)), c), w)
    timed("build_phi int-phase-tables", lambda c: keep(jnp.stack(
        fe.build_phi(c, mu1, mu2, p1, p2, rb, phase_span=KS // 2 + 1)), c), w)
    a = jnp.stack(fe.build_phi(w, mu1, mu2, p1, p2, rb))
    b = jnp.stack(fe.build_phi(w, mu1, mu2, p1, p2, rb,
                               phase_span=KS // 2 + 1))
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"  tables-vs-trig rel diff {rel:.2e}")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    main(sys.argv[1] if len(sys.argv) > 1 else "conv4")
