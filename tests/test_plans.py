"""Pin the fused backward kernels' grid/VMEM plans at the production
AlexNet-DAU layer shapes (host-side shape math only - no device work).

A plan regression is invisible to numerics tests and shows up on the chip
only as a mystery slowdown (a VMEM-budget change once pushed conv4 into 27
grid steps, ~12 us tunnel overhead each - PERF_NOTES). These tests turn
that class of change into a visible diff."""

import pytest

from dau_convnet_tpu.ops.fourier_engine import fused_plan_info

# (name, HW, S, F) of the four DAU layers at N=32, ks=9, bf16
ALEXNET_LAYERS = [("conv2", 27, 96, 256), ("conv3", 13, 256, 384),
                  ("conv4", 13, 384, 384), ("conv5", 13, 384, 256)]


@pytest.mark.quick
@pytest.mark.parametrize("g", [2, 4])
@pytest.mark.parametrize("has_dx", [False, True])
def test_phi_plans_single_chunk_at_13px_layers(g, has_dx):
    """The production phi gather stays single-chunk at every 13x13 layer
    (conv3/4/5), G=2 and G=4, with and without in-kernel dx - the measured
    single-chunk regime behind the PERF_NOTES numbers."""
    for name, hw, s, f in ALEXNET_LAYERS[1:]:
        p = fused_plan_info(hw, hw, 9, n=32, s=s, f=f, g=g,
                            has_dx=has_dx, gather="phi")
        assert p["single"], (name, g, has_dx, p)
        assert p["s_blk"] == 128 and p["f_blk"] == 128, (name, p)


@pytest.mark.quick
@pytest.mark.parametrize("g", [2, 4])
@pytest.mark.parametrize("has_dx", [False, True])
def test_factored_plans_single_chunk_at_13px_layers(g, has_dx):
    """The blocked factored gather also plans single-chunk at conv3/4/5:
    the joint (chunks, C) search trades C=8 down to C=4 for the dx variant
    instead of paying 3x the grid steps (round-4 plan fix)."""
    for name, hw, s, f in ALEXNET_LAYERS[1:]:
        p = fused_plan_info(hw, hw, 9, n=32, s=s, f=f, g=g,
                            has_dx=has_dx, gather="factored")
        assert p["single"], (name, g, has_dx, p)
        assert p["c_blk"] >= 4, (name, p)


@pytest.mark.quick
def test_conv2_plans_exist_and_chunk():
    """conv2 (B=496, S=96) exceeds single-chunk VMEM for both gathers; the
    plan must still exist (chunked) rather than erroring - the op's fused
    path falls back to unfused only via the bin-count gate / FusedPlanError,
    and conv2's production route is the unfused form by measurement."""
    for gather in ("phi", "factored"):
        p = fused_plan_info(27, 27, 9, n=32, s=96, f=256, g=2,
                            has_dx=False, gather=gather)
        assert not p["single"], (gather, p)
        assert p["n_k1"] * p["k1_blk"] >= 31, (gather, p)  # covers p1


@pytest.mark.quick
def test_resolve_gather_policy():
    """The fused_gather='auto' trace-time policy after the round-5
    recalibration (FACTORED_MIN_BINS = None): phi at EVERY bin count -
    the blocked-dot factored form measured slower at both bin regimes
    (PERF_NOTES round 5) - and explicit forms pass through untouched.
    (The end-to-end numerics of the explicit factored form run in the
    full tier: test_round2_features.py::
    test_fused_gather_factored_high_bins_matches_unfused.)"""
    from dau_convnet_tpu.ops.dau_conv import (
        DAUConvSettings, FACTORED_MIN_BINS, _resolve_gather)

    assert FACTORED_MIN_BINS is None  # round-5 measured calibration
    auto = DAUConvSettings(kernel_size=9, fused_gather="auto")
    for bins in (1, 153, 256, 257, 496, 10_000):
        assert _resolve_gather(auto, bins) == "phi"
    for form in ("phi", "factored"):
        cfg = DAUConvSettings(kernel_size=9, fused_gather=form)
        assert _resolve_gather(cfg, 153) == form
        assert _resolve_gather(cfg, 496) == form


@pytest.mark.quick
def test_plan_rejects_oversized_shape():
    """No-plan shapes raise FusedPlanError (the op catches it and keeps the
    unfused path)."""
    from dau_convnet_tpu.kernels.fused_bwd import FusedPlanError

    with pytest.raises(FusedPlanError):
        # S=F=512 at a 27px image: no k1 chunking can fit VMEM
        fused_plan_info(27, 27, 9, n=256, s=512, f=512, g=4,
                        has_dx=True, gather="phi")
