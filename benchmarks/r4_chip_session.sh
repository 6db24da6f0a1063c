#!/bin/bash
# Round-4 chip measurement session (staged during the relay outage):
# priority-ordered, each step logged, survives individual failures.
# Run from the repo root when the TPU relay is back
# (`ss -tln | grep 808` shows listeners).
cd "$(dirname "$0")/.."
L=${DAU_PROBE_LOGDIR:-/tmp/r4logs}
mkdir -p "$L"
run() {  # run <name> <timeout_s> <cmd...>; returns the command's rc
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$L/session.log"
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc $(date +%H:%M:%S)" | tee -a "$L/session.log"
  return $rc
}
# 0. sanity + warms shared compiles. Only when it SUCCEEDS is the per-bench
# backend wait capped at 2 min (so a mid-session relay death fails fast);
# if sanity fails the benches keep the 15-min default wait that covers the
# observed 10-20 min recovery band.
if run sanity 300 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((256,256)).sum()))"; then
  export DAU_BENCH_BACKEND_WAIT_S=120
fi
# 0b. official capture FIRST: the default bench (with its inline small/large
# variant captures) compiles exactly the set the driver's cold round-end
# `python bench.py` needs warm in .jax_cache — if the relay dies again
# mid-session, this is the one artifact that must exist.
run bench_default_first 7200 python bench.py
# 1. compiled correctness of the blocked factored kernel (asserts)
run oracle_factored 1800 python benchmarks/tpu_oracle_check.py factored
# 2. drift audit: current phi kernel vs the round-2 tree (f389f4b), same probe
run drift_current 1800 python benchmarks/fused_bwd_probe.py conv4
[ -d /tmp/r2tree ] || git worktree add /tmp/r2tree f389f4b
run drift_r2tree 1800 bash -c "cd /tmp/r2tree && python benchmarks/fused_bwd_probe.py conv4"
# 3. blocked factored standalone at the two bin regimes
run factored_conv4 1800 python benchmarks/fused_bwd_probe.py --gather factored conv4
run factored_conv2 1800 python benchmarks/fused_bwd_probe.py --gather factored conv2
# 4. G=4 budget: per-layer fused probes, both gathers, + the per-component
#    table the round-3 verdict asks for (phi build / fwd apply / dx / grads)
run g4_phi 2400 python benchmarks/fused_bwd_probe.py --g 4 conv2 conv3 conv4 conv5
run g4_factored 1800 python benchmarks/fused_bwd_probe.py --g 4 --gather factored conv4
run g4_budget 2400 python benchmarks/budget_r2.py --g 4 conv2 conv3 conv4 conv5
echo "PHASE-A-DONE $(date +%H:%M:%S)" | tee -a "$L/session.log"
# 5. in-step A/Bs + refreshed captures (bench_default_first warmed the
# variant compiles, so these measure warm)
run bench_small 3600 python bench.py --variant small
run bench_large 3600 python bench.py --variant large
run bench_default 3600 python bench.py
run bench_factored 3600 python bench.py --fused-gather factored
run bench_large_factored 3600 python bench.py --variant large --fused-gather factored
run bench_n128 3600 python bench.py --N 128
# per-shape policy A/B: auto = factored at conv2-class bin counts (B>=257,
# where the phi form is gated off anyway), phi elsewhere
run bench_auto_gather 3600 python bench.py --fused-gather auto
run bench_large_auto 3600 python bench.py --variant large --fused-gather auto
run bench_layer 1800 python bench.py --model layer
echo "SESSION-DONE $(date +%H:%M:%S)" | tee -a "$L/session.log"
