"""Unit tests for bench.py's variant-subprocess capture (the official
BENCH_rN line's small/large entries). The real path first runs on the chip
during the driver's capture, so the parse/forward/error logic is pinned
here with an injected subprocess.run stand-in."""

import json
import types

import pytest

import bench


class _Args:
    engine = "fourier"
    fused_bwd = "auto"
    fused_dx = "auto"
    fused_gather = "phi"
    iters = 20


def _result(stdout="", stderr="", rc=0):
    return types.SimpleNamespace(stdout=stdout, stderr=stderr, returncode=rc)


SUB_LINE = json.dumps({
    "metric": "alexnet_dau_small_trainstep_images_per_sec(N32,227x227,bf16)",
    "value": 4055.0, "unit": "images/sec", "vs_baseline": 0.302,
    "detail": {"dau_step_ms": 7.89, "conv3x3_step_ms": 2.38,
               "dau_step_pairs_ms": [7.8, 7.89, 7.95],
               "dau_units": 371200},
})


@pytest.mark.quick
def test_variant_subprocess_success_parses_last_json_line():
    seen = {}

    def fake_run(cmd, **kw):
        seen["cmd"] = cmd
        seen["env"] = kw["env"]
        seen["timeout"] = kw["timeout"]
        return _result(stdout="bench: backend recovered on attempt 2\n"
                              + SUB_LINE + "\n")

    out = bench._measure_variant_subprocess("small", _Args(), t_conv=2.4e-3,
                                            _run=fake_run)
    assert out["images_per_sec"] == 4055.0
    assert out["dau_step_ms"] == 7.89
    assert out["dau_units"] == 371200
    # ratio against the HEADLINE run's conv median, not the subprocess's
    assert out["vs_baseline"] == round(2.4 / 7.89, 4)
    # flag forwarding: the subprocess measures the same config class
    assert seen["cmd"][2:] == ["--variant", "small", "--engine", "fourier",
                               "--fused-bwd", "auto", "--fused-dx", "auto",
                               "--fused-gather", "phi", "--iters", "20"]
    # recursion guard: the child must not measure variants of its own
    assert seen["env"]["DAU_BENCH_ALL_VARIANTS"] == "0"
    assert seen["timeout"] > 0


SUB_LINE_N128 = json.dumps({
    "metric": "alexnet_dau_default_trainstep_images_per_sec(N128,227x227,bf16)",
    "value": 5581.0, "unit": "images/sec", "vs_baseline": 0.270,
    "detail": {"dau_step_ms": 22.93, "conv3x3_step_ms": 6.19,
               "dau_step_pairs_ms": [22.9, 22.93, 23.0],
               "dau_units": 693248},
})


@pytest.mark.quick
def test_variant_subprocess_own_baseline_for_different_batch():
    seen = {}

    def fake_run(cmd, **kw):
        seen["cmd"] = cmd
        return _result(stdout=SUB_LINE_N128 + "\n")

    out = bench._measure_variant_subprocess(
        "default", _Args(), t_conv=2.4e-3, _run=fake_run,
        extra=("--N", "128"), own_baseline=True)
    # N=128's conv was measured at N=128 inside the subprocess; the headline
    # N=32 conv median must NOT be used as its denominator
    assert out["vs_baseline"] == 0.270
    assert out["conv3x3_step_ms"] == 6.19
    assert seen["cmd"][-2:] == ["--N", "128"]


SUB_LINE_INFER = json.dumps({
    "metric": ("alexnet_dau_default_inference_images_per_sec"
               "(N32,227x227,bf16,phi_cached)"),
    "value": 21000.0, "unit": "images/sec", "vs_baseline": 0.61,
    "detail": {"dau_serving_ms": 1.5, "dau_plain_fwd_ms": 2.1,
               "conv3x3_fwd_ms": 0.92, "phi_cache_speedup": 1.4,
               "engine": "fourier", "device": "TPU v5 lite0"},
})


@pytest.mark.quick
def test_variant_subprocess_raw_forwards_inference_schema():
    seen = {}

    def fake_run(cmd, **kw):
        seen["cmd"] = cmd
        return _result(stdout=SUB_LINE_INFER + "\n")

    out = bench._measure_variant_subprocess(
        "default", _Args(), t_conv=2.4e-3, _run=fake_run,
        extra=("--model", "inference"), own_baseline=True, raw=True)
    # the inference mode's own ratio and detail come through verbatim
    # (its detail has no dau_step_ms; raw mode must not KeyError on it)
    assert out["images_per_sec"] == 21000.0
    assert out["vs_baseline"] == 0.61
    assert out["dau_serving_ms"] == 1.5
    assert out["phi_cache_speedup"] == 1.4
    assert "device" not in out
    assert seen["cmd"][-2:] == ["--model", "inference"]


@pytest.mark.quick
def test_variant_subprocess_failure_is_error_entry_not_raise():
    def fake_run(cmd, **kw):
        return _result(stdout="", stderr="Traceback...\nRuntimeError: boom",
                       rc=1)

    out = bench._measure_variant_subprocess("large", _Args(), t_conv=2.4e-3,
                                            _run=fake_run)
    assert set(out) == {"error"}
    assert "rc=1" in out["error"] and "boom" in out["error"]


@pytest.mark.quick
def test_variant_subprocess_timeout_is_error_entry():
    import subprocess

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw["timeout"])

    out = bench._measure_variant_subprocess("small", _Args(), t_conv=2.4e-3,
                                            _run=fake_run)
    assert set(out) == {"error"}
    assert "TimeoutExpired" in out["error"]
