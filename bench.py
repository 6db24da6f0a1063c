"""Benchmark: DAU layer fwd+bwd throughput vs an equivalent plain conv.

Reproduces the reference's own perf harness (`test_DAUConvSpeedTest`,
plugins/tensorflow/tests/dau_conv_test.py:504-628): one DAU layer with
2x1 units, k=9 on N=32, S=128, 16x16 -> F=32, fwd+bwd, timed against a
3x3 conv2d of the same shape. Prints ONE JSON line; `vs_baseline` is
DAU throughput / conv throughput (>= 1.0 meets the north star
"DAU fwd+bwd >= conv-equivalent images/sec", BASELINE.md).

Run on the real TPU chip: `python bench.py`.

Default mode (`--model alexnet`): the BASELINE.md north-star metric - the
full AlexNet-DAU (0.7M units) training step in images/sec/chip, vs the same
net with 3x3 convs. `--model layer` gives the reference speedtest
single-layer microbench.
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

# Pre-argparse scan so the platform is forced before the first backend use
# (the axon sitecustomize overrides JAX_PLATFORMS, so it must go through
# jax.config). CPU numbers are meaningless as benchmarks; the flag exists so
# the full bench code path can be smoke-tested without a live chip.
_FORCED_CPU = False
for _i, _a in enumerate(sys.argv):
    if (_a == "--device" and _i + 1 < len(sys.argv)
            and sys.argv[_i + 1] == "cpu") or _a == "--device=cpu":
        _FORCED_CPU = True
if _FORCED_CPU:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

# observability only (trace-time path-selection logs from the op; never
# affects traced behavior): DAU_LOGLEVEL=INFO python bench.py
logging.basicConfig(level=os.environ.get("DAU_LOGLEVEL", "WARNING"))

# --- wall-clock budget -------------------------------------------------
# The driver's round-end capture has a hard timeout (BENCH_r04 died rc=124
# with ZERO output because the headline JSON printed only after up to 80 min
# of optional variant work). Everything below is budgeted against _T0 so the
# bench degrades to headline-only instead of being killed mid-flight.
_T0 = time.monotonic()


def _total_budget_s() -> float:
    """Total wall-clock budget for the whole bench (default 25 min - safely
    under the assumed <=30 min driver timeout)."""
    return float(os.environ.get("DAU_BENCH_TOTAL_BUDGET_S", 1500))


def _remaining_s() -> float:
    return _total_budget_s() - (time.monotonic() - _T0)

# Persistent compilation cache: the production step embeds Mosaic kernels
# whose first compile is minutes over the remote-compile tunnel; cached
# executables make warm runs start in seconds.
try:  # pragma: no cover - cache is best-effort
    import os as _os
    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

PEAK_BF16_FLOPS = 197e12  # TPU v5e


def wait_for_backend(timeout_s=None, poll_s=30, probe_timeout=150):
    """Block until the accelerator backend answers a trivial computation.

    The axon tunnel's observed failure modes are (a) fail-fast
    RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE") and
    (b) an indefinite hang on first device contact; both recover within
    10-20 min (round-3 notes). Probing in a SUBPROCESS covers both: a hang
    is bounded by `probe_timeout` and a failed init isn't cached into this
    process's jax. Polls every `poll_s` seconds for up to `timeout_s`
    (default 900 - the observed tunnel wedges recover within
    10-20 min; override DAU_BENCH_BACKEND_WAIT_S, 0 disables waiting).
    """
    import subprocess
    import sys

    if timeout_s is None:
        timeout_s = float(os.environ.get("DAU_BENCH_BACKEND_WAIT_S", 900))
        # never let the backend wait starve the measurement itself: leave at
        # least 8 min of the total budget for the headline numbers
        timeout_s = min(timeout_s, max(60.0, _remaining_s() - 480))
    if timeout_s <= 0:  # 0 disables the wait entirely (no probe at all)
        return
    code = ("import jax, jax.numpy as jnp;"
            "jax.block_until_ready(jnp.ones((128, 128)).sum());"
            "print('BACKEND_OK', jax.devices()[0])")
    deadline = time.monotonic() + timeout_s
    attempt = 0
    while True:
        attempt += 1
        err = "unknown"
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=probe_timeout)
            if r.returncode == 0 and "BACKEND_OK" in r.stdout:
                if attempt > 1:
                    print(f"bench: backend recovered on attempt {attempt}",
                          file=sys.stderr)
                return
            tail = (r.stderr or r.stdout).strip().splitlines()
            err = tail[-1] if tail else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            err = f"probe hung > {probe_timeout}s (wedged tunnel?)"
        if time.monotonic() >= deadline:
            raise RuntimeError(
                f"accelerator backend unavailable after {attempt} probes "
                f"over {timeout_s:.0f}s; last error: {err}")
        print(f"bench: backend not ready (attempt {attempt}: {err}); "
              f"retrying in {poll_s}s", file=sys.stderr)
        time.sleep(poll_s)


def _default_engine(model: str) -> str:
    """Production engine per benchmark: the Fourier engine wins the model
    benchmark at every AlexNet layer shape (PERF_NOTES.md round-2 table);
    the f32/HIGHEST layer microbench keeps the dense engine (oracle-exact
    reference mode)."""
    return "fourier" if model in ("alexnet", "inference") else "xla"


def time_chained(make_step, carry, iters=100, pairs=3):
    """Per-iteration wall time of `iters` data-dependent on-device steps.

    Each step's outputs feed the next step's inputs inside one jitted
    lax.scan, so the device must execute them serially - repeated identical
    dispatches can be elided/overlapped by the runtime (observed on the axon
    tunnel: naive loops implied > 1 PFLOP/s on a v5e chip). Fixed costs
    (dispatch, transfer) are removed by differencing two lengths.
    """
    def body(c, _):
        return make_step(c), None

    def measure(n):
        fn = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])
        out = fn(carry)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(carry)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    def run_pair():
        n1 = max(1, iters // 5)
        t1 = measure(n1)
        # scale the long run so the differenced signal dominates dispatch
        # noise
        n2 = max(iters, int(n1 * max(2.0, 0.08 / max(t1, 1e-5))))
        t2 = measure(n2)
        dt = (t2 - t1) / (n2 - n1)
        if dt <= 0:  # fast steps: fall back to the amortized long run
            dt = t2 / n2
        return dt, t2, t1, n1, n2

    # Median of three independent pairs: the differenced signal of a
    # single pair varies run-to-run by up to ~20% on the fast (conv
    # baseline) model, which swings the headline ratio. Implausibly fast
    # pairs (a transient tunnel failure mode: chained scans returning
    # near-instantly) are discarded unless every pair hits it. The
    # plausibility cut scales with the pair's own expectation (the short
    # run projected to the long length), NOT a fixed wall-clock floor - a
    # fixed 0.02 s cutoff would discard every pair of a genuinely fast
    # step and quietly fall back to a single noisy pair (round-2 advice).
    import sys
    dts = []
    for _ in range(pairs):
        dt, t2, t1, n1, n2 = run_pair()
        # the long run can't legitimately finish faster than a quarter of
        # the short run's projection t1 * n2/n1 (dispatch overhead only
        # INFLATES the short run's per-step time)
        if t2 < 0.25 * t1 * n2 / n1:
            print("time_chained: implausibly fast measurement, discarding",
                  file=sys.stderr)
            continue
        dts.append(dt)
    if not dts:
        dts = [run_pair()[0]]
    time_chained.last_pairs_ms = [round(d * 1e3, 4) for d in dts]
    return sorted(dts)[len(dts) // 2]


def _measure_variant_subprocess(vname, args, t_conv, _run=None, extra=(),
                                own_baseline=False, raw=False):
    """Measure one AlexNet-DAU variant in a bounded subprocess.

    The headline numbers are already in hand when this runs; a tunnel hang
    inside an in-process variant measurement (failure mode (b), uncatchable
    by `except`) must not prevent the headline line from printing, so the
    variant gets its own process and a hard timeout (further capped by the
    remaining total budget). Returns the variants[] entry dict; never raises
    (errors come back as {"error": ...}). `extra` appends argv (e.g. a
    different --N); `own_baseline=True` takes the subprocess's own
    vs_baseline (its conv was measured at ITS batch size, so the headline
    conv median is not comparable). `raw=True` forwards the subprocess's
    value/vs_baseline/detail verbatim (for modes with a different detail
    schema, e.g. --model inference). `_run` injects a subprocess.run
    stand-in for tests.
    """
    import subprocess
    run = _run or subprocess.run
    try:
        env = dict(os.environ, DAU_BENCH_ALL_VARIANTS="0")
        cmd = [sys.executable, os.path.abspath(__file__),
               "--variant", vname, "--engine", args.engine,
               "--fused-bwd", args.fused_bwd,
               "--fused-dx", args.fused_dx,
               "--fused-gather", args.fused_gather,
               "--iters", str(args.iters)] + list(extra)
        timeout = min(float(os.environ.get("DAU_BENCH_VARIANT_TIMEOUT_S",
                                           2400)),
                      max(60.0, _remaining_s() - 60))
        r = run(cmd, capture_output=True, text=True, env=env, timeout=timeout)
        line = next((l for l in reversed(r.stdout.splitlines())
                     if l.startswith("{")), None)
        if line is None:
            tail = (r.stderr or r.stdout).strip().splitlines()
            raise RuntimeError(
                f"variant subprocess rc={r.returncode}: "
                f"{tail[-1] if tail else 'no output'}")
        sub = json.loads(line)
        if raw:
            det = dict(sub.get("detail", {}))
            det.pop("device", None)
            return {"images_per_sec": sub["value"],
                    "vs_baseline": sub["vs_baseline"], **det}
        out = {
            "images_per_sec": sub["value"],
            "dau_step_ms": sub["detail"]["dau_step_ms"],
            # ratio against the headline run's conv median so the variants
            # share one baseline (except own_baseline runs, see above)
            "vs_baseline": sub["vs_baseline"] if own_baseline else round(
                t_conv * 1e3 / sub["detail"]["dau_step_ms"], 4),
            "dau_step_pairs_ms": sub["detail"]["dau_step_pairs_ms"],
            "dau_units": sub["detail"]["dau_units"],
        }
        if own_baseline:
            out["conv3x3_step_ms"] = sub["detail"]["conv3x3_step_ms"]
        return out
    except Exception as e:  # noqa: BLE001 - keep the capture alive
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def bench_alexnet(args):
    """Full AlexNet-DAU training step (fwd+bwd+SGD), images/sec/chip -
    the BASELINE.md north-star metric. vs_baseline compares against the
    same AlexNet with plain 3x3 convs in place of the DAU layers."""
    import optax
    from flax import linen as nn

    from dau_convnet_tpu.models import AlexNetDAU
    from dau_convnet_tpu.models.alexnet import ALEXNET_DAU_VARIANTS

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    N = args.N
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, 3, 227, 227)), dtype)
    labels = jnp.asarray(rng.integers(0, 1000, (N,)))
    tx = optax.sgd(1e-4)

    class AlexNetConv(nn.Module):
        """conv3x3 stand-in baseline with identical channel widths."""
        @nn.compact
        def __call__(self, z):
            y = jnp.transpose(z, (0, 2, 3, 1))
            y = nn.relu(nn.Conv(96, (11, 11), strides=(4, 4), padding="VALID",
                                dtype=dtype)(y))
            y = nn.max_pool(y, (3, 3), strides=(2, 2))
            for f, pool in ((256, True), (384, False), (384, False), (256, True)):
                y = nn.relu(nn.Conv(f, (3, 3), padding="SAME", dtype=dtype)(y))
                if pool:
                    y = nn.max_pool(y, (3, 3), strides=(2, 2))
            y = y.reshape(y.shape[0], -1)
            y = nn.relu(nn.Dense(4096, dtype=dtype)(y))
            y = nn.relu(nn.Dense(4096, dtype=dtype)(y))
            return nn.Dense(1000, dtype=dtype)(y)

    def make_step(model, params):
        opt_state = tx.init(params)

        def step(carry):
            params, opt_state = carry

            def loss_fn(p):
                logits = model.apply(p, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()

            _, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state2)

        return step, (params, opt_state)

    # algorithmic (gather-semantics) FLOPs of the DAU layers per step: the
    # minimal work of the reference's 4-tap gather formulation, fwd + input
    # grad + 3 derivative tables (2 FLOPs/MAC). An *algorithmic* MFU - how
    # close the step is to the hardware floor of the math itself; engine
    # formulations (dense synth conv: ~ks^2/(4G) more, fourier: ~bins/(H*W*4G)
    # more) sit between this and the chip peak.
    units = ALEXNET_DAU_VARIANTS[args.variant]
    g_units = units[0] * units[1]
    layer_px = ((96, 256, 27), (256, 384, 13), (384, 384, 13), (384, 256, 13))
    taps = 4
    gather_flops = sum(2 * N * s * g_units * f * hw * hw * taps * 5
                       for s, f, hw in layer_px)

    # tight budget -> fewer timing pairs (3 is the round-2 default; 5 only
    # tightens the headline-ratio spread when there's time to pay for it)
    pairs = 5 if _remaining_s() > 600 else 3

    def measure_dau(variant, pairs):
        dau = AlexNetDAU(variant=variant, train=False, dtype=dtype,
                         engine=args.engine, fused_bwd=args.fused_bwd,
                         fused_dx=args.fused_dx, fused_gather=args.fused_gather)
        dau_params = jax.jit(dau.init)(jax.random.PRNGKey(0), x)
        step, carry = make_step(dau, dau_params)
        t = time_chained(step, carry, args.iters, pairs=pairs)
        return t, time_chained.last_pairs_ms, dau.num_dau_units()

    t_dau, dau_pairs, dau_units = measure_dau(args.variant, pairs=pairs)

    conv = AlexNetConv()
    conv_params = jax.jit(conv.init)(jax.random.PRNGKey(0), x)
    cstep, ccarry = make_step(conv, conv_params)
    # the conv baseline's differenced pairs swing up to ~2x run-to-run on
    # the tunnel (observed [1.51, 2.39, 5.30] in one run); a 5-pair median
    # costs seconds and halves the headline-ratio spread
    t_conv = time_chained(cstep, ccarry, args.iters, pairs=pairs)
    conv_pairs = time_chained.last_pairs_ms

    headline = {
        "metric": f"alexnet_dau_{args.variant}_trainstep_images_per_sec(N{N},227x227,{args.dtype})",
        "value": round(N / t_dau, 1),
        "unit": "images/sec",
        "vs_baseline": round(t_conv / t_dau, 4),
        "detail": {
            "dau_step_ms": round(t_dau * 1e3, 3),
            "conv3x3_step_ms": round(t_conv * 1e3, 3),
            # the differenced pair values behind each median: the conv
            # baseline swings up to ~20% pair-to-pair, so round-over-round
            # headline deltas should be read against this spread
            "dau_step_pairs_ms": dau_pairs,
            "conv3x3_step_pairs_ms": conv_pairs,
            "dau_units": dau_units,
            "engine": args.engine,
            # algorithmic MFU: reference-gather FLOPs / time / bf16 peak
            "gather_mfu_pct": round(
                gather_flops / t_dau / PEAK_BF16_FLOPS * 100, 2),
            "device": str(jax.devices()[0]),
        },
    }
    # THE HEADLINE PRINTS THE MOMENT IT EXISTS (BENCH_r04 died rc=124 with
    # zero output because this line used to wait behind up to 80 min of
    # optional variant work). The driver takes the LAST line, so each
    # variant below re-emits the full enriched line after it lands; a kill
    # at any point leaves a complete, parseable record on stdout.
    print(json.dumps(headline), flush=True)

    # Per-variant numbers in the SAME official line (round-3 verdict item
    # 1: the small/large records belong in BENCH_rN, not only in notes;
    # round-4 item 3 adds the N=128 production-batching mode). Only on the
    # default headline invocation; each extra variant runs in a bounded
    # SUBPROCESS: a tunnel hang inside an in-process variant measurement
    # (failure mode (b), uncatchable by `except`) must not sink later
    # output. Skipped under --device cpu (the smoke flag's purpose is one
    # cheap pass). DAU_BENCH_ALL_VARIANTS=0 disables.
    if (args.variant == "default" and N == 32 and not _FORCED_CPU
            and os.environ.get("DAU_BENCH_ALL_VARIANTS", "1") != "0"):
        variants = {}
        # last entry degrades first under a tight budget; inference (the
        # serving mode, own conv-fwd baseline + different detail schema)
        # rides along as a raw entry
        plan = (("small", "small", (), False, False),
                ("large", "large", (), False, False),
                ("N128", "default", ("--N", "128"), True, False),
                ("inference", "default", ("--model", "inference"),
                 True, True))
        for key, vname, extra, own, raw in plan:
            if _remaining_s() < 240:
                variants[key] = {
                    "skipped": f"budget ({_remaining_s():.0f}s left)"}
            else:
                variants[key] = _measure_variant_subprocess(
                    vname, args, t_conv, extra=extra, own_baseline=own,
                    raw=raw)
            headline["detail"]["variants"] = dict(variants)
            print(json.dumps(headline), flush=True)


def bench_alexnet_inference(args):
    """Serving throughput: fwd-only AlexNet-DAU logits, images/sec/chip.

    Three modes measured: the conv3x3 baseline, the plain DAU forward
    (phase table built per call, as in training), and the SERVING forward
    with the phi tables precomputed from the frozen params
    (`AlexNetDAU(phi_caching=True)` + the 'phi_cache' flax collection).
    The headline value is the serving mode; vs_baseline = conv_fwd /
    dau_serving step-time ratio. The reference has no separate serving
    path (inference = the same op, README.md:37-39)."""
    from flax import linen as nn

    from dau_convnet_tpu.models import AlexNetDAU

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    N = args.N
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, 3, 227, 227)), dtype)

    class AlexNetConv(nn.Module):
        @nn.compact
        def __call__(self, z):
            y = jnp.transpose(z, (0, 2, 3, 1))
            y = nn.relu(nn.Conv(96, (11, 11), strides=(4, 4),
                                padding="VALID", dtype=dtype)(y))
            y = nn.max_pool(y, (3, 3), strides=(2, 2))
            for f, pool in ((256, True), (384, False), (384, False),
                            (256, True)):
                y = nn.relu(nn.Conv(f, (3, 3), padding="SAME",
                                    dtype=dtype)(y))
                if pool:
                    y = nn.max_pool(y, (3, 3), strides=(2, 2))
            y = y.reshape(y.shape[0], -1)
            y = nn.relu(nn.Dense(4096, dtype=dtype)(y))
            y = nn.relu(nn.Dense(4096, dtype=dtype)(y))
            return nn.Dense(1000, dtype=dtype)(y)

    def fwd_time(model, variables):
        # keep the chain data-dependent: fold the logits back into the
        # carry so the scan can't elide/overlap the forwards
        def step(c):
            logits = model.apply(variables, c)
            return c + (jnp.sum(logits) * 1e-30).astype(c.dtype)

        return time_chained(step, x, args.iters, pairs=3)

    dau = AlexNetDAU(variant=args.variant, train=False, dtype=dtype,
                     engine=args.engine)
    dau_params = jax.jit(dau.init)(jax.random.PRNGKey(0), x)
    t_plain = fwd_time(dau, dau_params)

    dau_c = AlexNetDAU(variant=args.variant, train=False, dtype=dtype,
                       engine=args.engine, phi_caching=True)
    dau_vars = jax.jit(dau_c.init)(jax.random.PRNGKey(0), x)
    t_serving = fwd_time(dau_c, dau_vars)

    conv = AlexNetConv()
    conv_params = jax.jit(conv.init)(jax.random.PRNGKey(0), x)
    t_conv = fwd_time(conv, conv_params)

    print(json.dumps({
        "metric": (f"alexnet_dau_{args.variant}_inference_images_per_sec"
                   f"(N{N},227x227,{args.dtype},phi_cached)"),
        "value": round(N / t_serving, 1),
        "unit": "images/sec",
        "vs_baseline": round(t_conv / t_serving, 4),
        "detail": {
            "dau_serving_ms": round(t_serving * 1e3, 3),
            "dau_plain_fwd_ms": round(t_plain * 1e3, 3),
            "conv3x3_fwd_ms": round(t_conv * 1e3, 3),
            "phi_cache_speedup": round(t_plain / t_serving, 3),
            "engine": args.engine,
            "device": str(jax.devices()[0]),
        },
    }), flush=True)


def bench_memtest(args):
    """Long-run stability check - the TPU analogue of the reference's
    `test_DAUConvMemtest` (10k re-runs for leak detection with offsets
    initialized beyond bounds, dau_conv_test.py:635-682). Under XLA there is
    no allocator to leak, so this checks sustained throughput stability and
    numerical health over many chained steps with the clip path exercised."""
    from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    N, S, F, G = 32, 128, 256, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, 6, 6)), dtype)
    err = jnp.asarray(rng.standard_normal((N, F, 6, 6)), dtype)
    w = jnp.asarray(rng.standard_normal((1, S, G, F)) * 0.1, dtype)
    # beyond-bounds init exercises the clip path (reference inits +-10 on k=9)
    mu1 = jnp.asarray(rng.uniform(-10, 10, (1, S, G, F)), dtype)
    mu2 = jnp.asarray(rng.uniform(-10, 10, (1, S, G, F)), dtype)
    sigma = jnp.full((1,), 0.5, dtype)
    cfg = DAUConvSettings(kernel_size=9, compute_sigma_grad=False,
                          precision="default" if args.dtype == "bf16" else "highest")
    bound = 4 - 0.1
    lr = jnp.asarray(1e-5, dtype)

    def step(carry):
        x, w, mu1, mu2 = carry

        def f(x, w, mu1, mu2):
            y = dau_conv2d_op(cfg, x, w, jnp.clip(mu1, -bound, bound),
                              jnp.clip(mu2, -bound, bound), sigma)
            return jnp.vdot(y, err)

        _, g = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(x, w, mu1, mu2)
        return tuple(a - lr * gg.astype(a.dtype) for a, gg in zip(carry, g))

    def body(c, _):
        return step(c), None

    iters = args.iters or 2000
    fn = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    carry = (x, w, mu1, mu2)
    out = fn(carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(carry)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    finite = all(bool(jnp.all(jnp.isfinite(a.astype(jnp.float32)))) for a in out)
    print(json.dumps({
        "metric": f"memtest_steps_per_sec({iters}_chained_steps,{args.dtype})",
        "value": round(iters / dt, 1),
        "unit": "steps/sec",
        "vs_baseline": 1.0 if finite else 0.0,
        "detail": {"all_finite": finite, "total_s": round(dt, 2),
                   "device": str(jax.devices()[0])},
    }))


def _run_guarded(argv):
    """Re-exec the bench in a watched child and guarantee exactly one
    parseable JSON line on stdout no matter how the child dies.

    The driver kills overruns with SIGKILL after its own timeout and takes
    the LAST stdout line; BENCH_r04 was rc=124 with zero output. The guard
    streams the child's stdout through as lines arrive (each flushed) and
    bounds the child at the total budget + grace; if the child produced no
    JSON by then, the guard prints the null-schema line itself. Never
    returns."""
    import subprocess
    import threading

    budget = _total_budget_s() + 180
    env = dict(os.environ, DAU_BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + list(argv),
        stdout=subprocess.PIPE, text=True, env=env, bufsize=1)
    emitted = []

    def pump():
        for line in proc.stdout:
            line = line.rstrip("\n")
            if not line:
                continue
            print(line, flush=True)
            if line.startswith("{"):
                emitted.append(line)

    th = threading.Thread(target=pump, daemon=True)
    th.start()
    try:
        rc = proc.wait(timeout=budget)
    except subprocess.TimeoutExpired:
        print(f"bench guard: child overran {budget:.0f}s budget, killing",
              file=sys.stderr)
        proc.kill()
        rc = None
    th.join(timeout=30)
    if not emitted:
        print(json.dumps({
            "metric": "alexnet_dau_default_trainstep_images_per_sec",
            "value": None, "unit": "images/sec", "vs_baseline": None,
            "error": f"bench child rc={rc} produced no JSON line within "
                     f"{budget:.0f}s",
        }), flush=True)
        sys.exit(1)
    try:
        ok = json.loads(emitted[-1]).get("value") is not None
    except Exception:  # noqa: BLE001
        ok = False
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser(
        # abbreviations off: the pre-import --device scan matches exact
        # tokens, so argparse must not accept spellings the scan misses
        allow_abbrev=False)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--S", type=int, default=128)
    ap.add_argument("--F", type=int, default=32)
    ap.add_argument("--HW", type=int, default=16)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--dtype", default=None, choices=["f32", "bf16"])
    ap.add_argument("--engine", default=None,
                    choices=["xla", "fourier", "pallas", "pallas_fused"])
    ap.add_argument("--model", default="alexnet",
                    choices=["layer", "alexnet", "inference", "memtest"])
    ap.add_argument("--variant", default="default",
                    choices=["small", "default", "large"])
    ap.add_argument("--fused-bwd", dest="fused_bwd", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--fused-dx", dest="fused_dx", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--fused-gather", dest="fused_gather", default="phi",
                    choices=["phi", "factored", "auto"])
    ap.add_argument("--device", choices=["default", "cpu"], default="default",
                    help="cpu = force the CPU backend (smoke-testing the "
                         "bench path without a chip; handled pre-import)")
    ap.add_argument("--static-max-offset", dest="static_max_offset",
                    type=float, default=3.0,
                    help="layer model only: the static tap bound (the "
                         "trace-time stand-in for the reference's runtime "
                         "tier dispatch); smaller = smaller synthesized "
                         "kernel. Measures the tier re-jit payoff "
                         "(utils.tiers.retier_offset).")
    args = ap.parse_args()

    if args.dtype is None:
        # production dtype for the model benchmarks; oracle-exact f32 for the
        # layer microbench (comparable to the reference's fp32 CUDA numbers)
        args.dtype = "f32" if args.model == "layer" else "bf16"
    if args.engine is None:
        args.engine = _default_engine(args.model)
    if args.iters is None:
        args.iters = {"alexnet": 20, "layer": 100, "memtest": 2000,
                      "inference": 50}[args.model]

    # survive a transiently wedged axon tunnel before first backend use
    # (round 3's official bench crashed rc=1 on exactly this); pointless
    # when the platform is forced to CPU (the subprocess probe would not
    # inherit the forcing and would hang on the accelerator backend)
    if not _FORCED_CPU:
        wait_for_backend()

    if args.model == "alexnet":
        bench_alexnet(args)
        return
    if args.model == "inference":
        bench_alexnet_inference(args)
        return
    if args.model == "memtest":
        bench_memtest(args)
        return

    from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    N, S, F, HW = args.N, args.S, args.F, args.HW
    G = 2  # dau_units (2, 1), reference speedtest config
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, S, HW, HW)), dtype)
    err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), dtype)
    w = jnp.asarray(rng.standard_normal((1, S, G, F)) * 0.1, dtype)
    bound = 4 - 0.01
    # offsets must honor the static promise (the op clips |mu| to it); the
    # reference speedtest inits +-3 on k=9
    mu_init = min(3.0, args.static_max_offset)
    mu1 = jnp.asarray(rng.uniform(-mu_init, mu_init, (1, S, G, F)), dtype)
    mu2 = jnp.asarray(rng.uniform(-mu_init, mu_init, (1, S, G, F)), dtype)
    sigma = jnp.full((1, S, G, F), 0.5, dtype)

    # static_max_offset=3 mirrors what the reference's runtime tier dispatch
    # achieves on this config (offsets init +-3 on k=9 -> smallest tier);
    # sigma is not trained by default in the reference, so no sigma table.
    cfg = DAUConvSettings(kernel_size=9, mu_learning_rate_factor=1.0,
                          static_max_offset=args.static_max_offset,
                          compute_sigma_grad=False,
                          precision="highest" if args.dtype == "f32" else "default",
                          engine=args.engine)

    lr = jnp.asarray(1e-6, dtype)

    def dau_step(carry):
        x, w, mu1, mu2 = carry

        def f(x, w, mu1, mu2):
            y = dau_conv2d_op(cfg, x, w,
                              jnp.clip(mu1, -bound, bound),
                              jnp.clip(mu2, -bound, bound), sigma)
            return jnp.vdot(y, err)

        _, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(x, w, mu1, mu2)
        # SGD-like update chains each iteration to the previous one
        return tuple(a - lr * g for a, g in zip(carry, grads))

    # baseline: plain 3x3 conv, fwd+bwd on identical shapes
    k3 = jnp.asarray(rng.standard_normal((F, S, 3, 3)) * 0.1, dtype)

    def conv_step(carry):
        x, k = carry

        def f(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return jnp.vdot(y, err)

        _, grads = jax.value_and_grad(f, argnums=(0, 1))(x, k)
        return tuple(a - lr * g for a, g in zip(carry, grads))

    t_dau = time_chained(dau_step, (x, w, mu1, mu2), args.iters)
    dau_pairs = time_chained.last_pairs_ms
    t_conv = time_chained(conv_step, (x, k3), args.iters)
    conv_pairs = time_chained.last_pairs_ms

    ips = N / t_dau
    off_tag = (f",off{args.static_max_offset:g}"
               if args.static_max_offset != 3.0 else "")
    print(json.dumps({
        "metric": f"dau_layer_fwdbwd_images_per_sec(N{N},S{S},{HW}x{HW},F{F},2x1units,k9,{args.dtype},{args.engine}{off_tag})",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(t_conv / t_dau, 4),
        "detail": {
            "dau_ms": round(t_dau * 1e3, 4),
            "conv3x3_ms": round(t_conv * 1e3, 4),
            "dau_pairs_ms": dau_pairs,
            "conv3x3_pairs_ms": conv_pairs,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    # Guard wrap (see _run_guarded): the top-level invocation only watches;
    # all real work happens in the child, marked by DAU_BENCH_CHILD=1.
    # DAU_BENCH_NO_GUARD=1 opts out (e.g. interactive debugging).
    if (os.environ.get("DAU_BENCH_CHILD") != "1"
            and os.environ.get("DAU_BENCH_NO_GUARD") != "1"):
        _run_guarded(sys.argv[1:])
    try:
        main()
    except RuntimeError as e:
        # Keep the official capture parseable even when the accelerator
        # never comes up (round 3's record was an rc=1 traceback): one
        # JSON line in the normal schema, value null, error attached.
        if "backend unavailable" not in str(e):
            raise
        print(json.dumps({
            "metric": "train_step_time", "value": None, "unit": "ms",
            "vs_baseline": None, "error": str(e),
        }))
        sys.exit(1)
