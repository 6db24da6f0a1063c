"""Compiled-kernel numerics vs the numpy oracle on the REAL chip.

The differential suite runs the Pallas kernels in interpret mode on CPU;
compiled Mosaic can in principle differ (layout/accumulation bugs the
interpreter cannot see). This check runs the full production op - fourier
engine with the fused backward kernel engaged - compiled on the TPU in
f32/HIGHEST at a shape whose f32 VMEM plan fits, and pins fwd + all 5
gradients against the numpy oracle at the reference tolerance.

Run: python benchmarks/tpu_oracle_check.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op  # noqa: E402
from tests.helpers import assert_matrix, oracle_fwd_bwd, random_case  # noqa: E402


def run_case(units, seed, gather="phi", fused_dx="auto"):
    rng = np.random.default_rng(seed)
    # S=128/F=128 at 13x13: the f32 fused-backward VMEM plan fits, so the
    # compiled Mosaic path (not a fallback) is what gets validated.
    x, w, mu1, mu2, sigma, err = random_case(
        rng, N=4, W=13, H=13, S=128, F=128, units=units, max_kernel_size=9,
        max_offset_init=3)
    cfg = DAUConvSettings(kernel_size=9, unit_testing=True,
                          precision="highest", engine="fourier",
                          fused_bwd="on", fused_gather=gather,
                          fused_dx=fused_dx)
    sig = np.broadcast_to(np.float32(sigma).reshape(1, 1, 1, 1),
                          w.shape).astype(np.float32)

    @jax.jit
    def fwd_bwd(x, w, mu1, mu2, sig, err):
        y, vjp = jax.vjp(lambda *a: dau_conv2d_op(cfg, *a), x, w, mu1, mu2,
                         sig)
        return y, vjp(err)

    y, (dx, dw, dmu1, dmu2, dsig) = fwd_bwd(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(mu1), jnp.asarray(mu2),
        jnp.asarray(sig), jnp.asarray(err))
    gt_fwd, gt_bwd = oracle_fwd_bwd(x, w, mu1, mu2, sigma, err,
                                    unit_testing=True)
    g = units[0] * units[1]
    tag = f"G{g}_{gather}" + ("_dx" if fused_dx == "on" else "")
    assert_matrix(np.asarray(y), gt_fwd, f"{tag}_fwd_output")
    assert_matrix(np.asarray(dx), gt_bwd[0], f"{tag}_bwd_error")
    assert_matrix(np.asarray(dw), gt_bwd[1], f"{tag}_bwd_w_grad")
    assert_matrix(np.asarray(dmu1), gt_bwd[2], f"{tag}_bwd_mu1_grad")
    assert_matrix(np.asarray(dmu2), gt_bwd[3], f"{tag}_bwd_mu2_grad")
    assert_matrix(np.asarray(dsig), gt_bwd[4], f"{tag}_bwd_sigma_grad")
    print(f"  {tag} ok", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    assert dev.platform == "tpu", "run on the real chip"
    only = sys.argv[1] if len(sys.argv) > 1 else None
    # G=2 (static-unrolled gather) and G=4 (in-kernel fori gather - the
    # AlexNet-DAU-large configuration, uncompilable before round 3), for
    # both gather forms, plus the in-kernel-dx variant. Pass a gather name
    # to run only that form (each compile is minutes over the tunnel).
    for gather in (("phi", "factored") if only is None else (only,)):
        run_case((2, 1), seed=7, gather=gather)
        run_case((2, 2), seed=8, gather=gather)
    if only is None:
        run_case((2, 1), seed=9, gather="phi", fused_dx="on")
    print("TPU-COMPILED-ORACLE-OK (fourier engine, fused backward, f32)",
          flush=True)


if __name__ == "__main__":
    main()
