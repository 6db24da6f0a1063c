"""Differential tests: dau_conv2d_op vs the numpy oracle.

Mirrors the reference's end-to-end suite (`test_DAUConvQuick` / `test_DAUConv`,
dau_conv_test.py:418-465) at CPU-test-friendly sizes; fwd output, input grad
and all four parameter grads are pinned at the reference tolerance policy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op

from helpers import assert_matrix, oracle_fwd_bwd, random_case


def run_case(N, W, H, S, F, units, max_kernel_size, max_offset_init, *,
             num_ignore=0, use_interpolation=True, mu_lr=1.0, seed=0,
             engine="xla", unit_testing=True):
    rng = np.random.default_rng(seed)
    x, w, mu1, mu2, sigma, err = random_case(
        rng, N=N, W=W, H=H, S=S, F=F, units=units,
        max_kernel_size=max_kernel_size, max_offset_init=max_offset_init,
        num_ignore=num_ignore)
    cfg = DAUConvSettings(
        kernel_size=max_kernel_size,
        use_interpolation=use_interpolation,
        number_units_ignore=num_ignore,
        mu_learning_rate_factor=mu_lr,
        unit_testing=unit_testing,
        engine=engine,
    )
    sig = np.broadcast_to(np.float32(sigma).reshape(1, 1, 1, 1), w.shape).astype(np.float32)

    @jax.jit
    def fwd_bwd(x, w, mu1, mu2, sig, err):
        y, vjp = jax.vjp(lambda *a: dau_conv2d_op(cfg, *a), x, w, mu1, mu2, sig)
        return y, vjp(err)

    y, (dx, dw, dmu1, dmu2, dsig) = fwd_bwd(x, w, mu1, mu2, sig, jnp.asarray(err))

    gt_fwd, gt_bwd = oracle_fwd_bwd(
        x, w, mu1, mu2, sigma, err, num_ignore=num_ignore,
        use_interpolation=use_interpolation, unit_testing=unit_testing)

    assert_matrix(np.asarray(y), gt_fwd, "fwd_output")
    assert_matrix(np.asarray(dx), gt_bwd[0], "bwd_error")
    assert_matrix(np.asarray(dw), gt_bwd[1], "bwd_w_grad")
    assert_matrix(np.asarray(dmu1), gt_bwd[2] * mu_lr, "bwd_mu1_grad")
    assert_matrix(np.asarray(dmu2), gt_bwd[3] * mu_lr, "bwd_mu2_grad")
    assert_matrix(np.asarray(dsig), gt_bwd[4], "bwd_sigma_grad")


# reference test_DAUConvQuick matrix, channel counts scaled down for the CPU
# oracle (the oracle loops per unit); geometry cases preserved.
QUICK_CASES = [
    # image patch splitting at low N (W=65, H=8)
    dict(N=2, W=65, H=8, S=5, F=4, units=(1, 2), max_kernel_size=9, max_offset_init=3),
    # small batch
    dict(N=1, W=8, H=8, S=4, F=4, units=(1, 2), max_kernel_size=9, max_offset_init=3),
    dict(N=4, W=8, H=8, S=4, F=4, units=(2, 2), max_kernel_size=9, max_offset_init=3),
    # kernel tier 17
    dict(N=2, W=32, H=32, S=4, F=4, units=(2, 2), max_kernel_size=17, max_offset_init=6),
    # dynamic-kernel-size case: large allowed kernel, small offsets
    dict(N=2, W=16, H=16, S=4, F=4, units=(2, 2), max_kernel_size=17, max_offset_init=3),
    # odd number of sub-features
    dict(N=2, W=16, H=16, S=3, F=4, units=(2, 2), max_kernel_size=17, max_offset_init=3),
    # tiny image
    dict(N=2, W=6, H=6, S=4, F=8, units=(2, 1), max_kernel_size=17, max_offset_init=8),
    # large kernel tier 33
    dict(N=1, W=40, H=40, S=3, F=4, units=(2, 2), max_kernel_size=33, max_offset_init=10),
]


@pytest.mark.parametrize("case", QUICK_CASES, ids=lambda c: f"k{c['max_kernel_size']}_S{c['S']}_W{c['W']}x{c['H']}_N{c['N']}")
def test_quick(case):
    run_case(**case)


def test_mu_learning_rate_factor():
    run_case(N=1, W=8, H=8, S=3, F=4, units=(1, 2), max_kernel_size=9,
             max_offset_init=3, mu_lr=500.0, seed=3)


def test_single_unit_rounding():
    # (1,1) units round up to 2 with one ignored dummy unit
    # (reference test_DAUConvSingleUnit, dau_conv_test.py:631-633).
    run_case(N=2, W=12, H=12, S=3, F=4, units=(1, 2), max_kernel_size=9,
             max_offset_init=3, num_ignore=1, seed=4)


def test_no_interpolation():
    # reference test_DAUConvInterpolation (requires ALLOW_INTERPOLATION_OFF
    # build; first-class here).
    run_case(N=2, W=16, H=16, S=3, F=4, units=(2, 1), max_kernel_size=9,
             max_offset_init=3, use_interpolation=False, seed=5)


def test_kernel_tier_65():
    run_case(N=1, W=70, H=34, S=2, F=2, units=(2, 1), max_kernel_size=65,
             max_offset_init=20, seed=6)


@pytest.mark.parametrize("norm", ["square", "none"])
def test_normalization_variants(norm):
    """square_unit_normalization and no-normalization modes vs the oracle
    (reference base_dau_conv_layer.cu:605-683 normalization variants)."""
    rng = np.random.default_rng(7)
    from helpers import random_case as _rc
    x, w, mu1, mu2, sigma, err = _rc(rng, N=1, W=10, H=8, S=3, F=4,
                                     units=(2, 1), max_kernel_size=9,
                                     max_offset_init=3)
    square = norm == "square"
    cfg = DAUConvSettings(kernel_size=9, unit_testing=True,
                          unit_normalization=False,
                          square_unit_normalization=square)
    sig = np.broadcast_to(np.float32(sigma).reshape(1, 1, 1, 1), w.shape).astype(np.float32)

    @jax.jit
    def fwd_bwd(x, w, mu1, mu2, sig, err):
        y, vjp = jax.vjp(lambda *a: dau_conv2d_op(cfg, *a), x, w, mu1, mu2, sig)
        return y, vjp(err)

    y, grads = fwd_bwd(x, w, mu1, mu2, sig, jnp.asarray(err))

    from dau_convnet_tpu.ops import reference as oracle
    gt_fwd = oracle.forward(x, w, mu1, mu2, [float(sigma)],
                            unit_normalization=not square and norm != "none",
                            square_unit_normalization=square)
    gt_bwd = oracle.backward(x, err, w, mu1, mu2, [float(sigma)],
                             unit_testing=True,
                             unit_normalization=not square and norm != "none",
                             square_unit_normalization=square)
    assert_matrix(np.asarray(y), gt_fwd, "fwd_output")
    assert_matrix(np.asarray(grads[0]), gt_bwd[0], "bwd_error")
    assert_matrix(np.asarray(grads[1]), gt_bwd[1], "bwd_w_grad")
    assert_matrix(np.asarray(grads[2]), gt_bwd[2], "bwd_mu1_grad")
    assert_matrix(np.asarray(grads[3]), gt_bwd[3], "bwd_mu2_grad")
    assert_matrix(np.asarray(grads[4]), gt_bwd[4], "bwd_sigma_grad")


@pytest.mark.parametrize("engine", ["pallas", "pallas_fused"])
def test_engines_in_oracle_matrix(engine):
    """The Pallas engines pass the same oracle contract as the XLA engine
    (interpret mode on CPU; compiled equivalence is checked on TPU by
    /tmp-style scripts and bench.py)."""
    run_case(N=2, W=12, H=10, S=3, F=4, units=(2, 1), max_kernel_size=9,
             max_offset_init=3, seed=11, engine=engine)


@pytest.mark.parametrize("case", [
    dict(N=2, W=12, H=10, S=3, F=4, units=(2, 1), max_kernel_size=9,
         max_offset_init=3, seed=11),
    dict(N=2, W=65, H=8, S=5, F=4, units=(1, 2), max_kernel_size=9,
         max_offset_init=3, seed=0),
    dict(N=2, W=16, H=16, S=4, F=4, units=(2, 2), max_kernel_size=17,
         max_offset_init=6, seed=1),
    dict(N=2, W=16, H=16, S=3, F=4, units=(2, 1), max_kernel_size=9,
         max_offset_init=3, use_interpolation=False, seed=5),
    dict(N=2, W=12, H=12, S=3, F=4, units=(1, 2), max_kernel_size=9,
         max_offset_init=3, num_ignore=1, seed=4),
], ids=["base", "patchsplit", "k17", "nointerp", "dummyunit"])
def test_fourier_engine_in_oracle_matrix(case):
    """The Fourier engine (per-frequency contraction, fourier_engine.py) is
    semantically identical to the spatial engine: pinned against the numpy
    oracle at the reference tolerance across geometry/tier/interp/dummy-unit
    configs."""
    run_case(**case, engine="fourier")


# ---------------------------------------------------------------------------
# Shim-OFF coverage (unit_testing=False): the reference's last-row/col edge
# masking is a GPU-tile artifact (dau_conv_test.py:95-137) kept only as a
# compat shim - SURVEY 4.5's contract is that this implementation matches the
# oracle EVERYWHERE, so the edge-pixel parameter-gradient contributions must
# be pinned with the shim off on BOTH sides (round-2 verdict item).
# ---------------------------------------------------------------------------

SHIMOFF_CASES = [
    dict(N=2, W=12, H=10, S=3, F=4, units=(2, 1), max_kernel_size=9,
         max_offset_init=3, seed=21),
    dict(N=2, W=65, H=8, S=5, F=4, units=(1, 2), max_kernel_size=9,
         max_offset_init=3, seed=22),
    dict(N=2, W=16, H=16, S=4, F=4, units=(2, 2), max_kernel_size=17,
         max_offset_init=6, seed=23),
    dict(N=2, W=16, H=16, S=3, F=4, units=(2, 1), max_kernel_size=9,
         max_offset_init=3, use_interpolation=False, seed=24),
    dict(N=2, W=12, H=12, S=3, F=4, units=(1, 2), max_kernel_size=9,
         max_offset_init=3, num_ignore=1, seed=25),
]
_SHIM_IDS = ["base", "patchsplit", "k17", "nointerp", "dummyunit"]


@pytest.mark.parametrize("engine", ["xla", "fourier"])
@pytest.mark.parametrize("case", SHIMOFF_CASES, ids=_SHIM_IDS)
def test_shim_off(engine, case):
    run_case(**case, engine=engine, unit_testing=False)


@pytest.mark.parametrize("engine", ["pallas", "pallas_fused"])
def test_shim_off_pallas(engine):
    run_case(N=2, W=12, H=10, S=3, F=4, units=(2, 1), max_kernel_size=9,
             max_offset_init=3, seed=26, engine=engine, unit_testing=False)


def test_shim_off_fuzz():
    """Randomized shim-off slice: geometry/params drawn per trial, both
    production engines against the full-edge oracle."""
    rng = np.random.default_rng(99)
    for trial in range(4):
        case = dict(
            N=int(rng.integers(1, 3)),
            W=int(rng.integers(6, 20)), H=int(rng.integers(6, 20)),
            S=int(rng.integers(2, 5)), F=int(rng.integers(2, 6)),
            units=(int(rng.integers(1, 3)), int(rng.integers(1, 3))),
            max_kernel_size=9, max_offset_init=3, seed=100 + trial)
        if (case["units"][0] * case["units"][1]) % 2:
            case["units"] = (case["units"][0], case["units"][1] + 1)
        run_case(**case, engine="xla", unit_testing=False)
        run_case(**case, engine="fourier", unit_testing=False)
