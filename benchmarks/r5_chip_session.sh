#!/bin/bash
# Round-5 chip measurement session: evidence-first ordering (the round-4
# verdict's top items). Each step logged, survives individual failures.
cd "$(dirname "$0")/.."
L=${DAU_PROBE_LOGDIR:-/tmp/r5logs}
mkdir -p "$L"
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$L/session.log"
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc $(date +%H:%M:%S)" | tee -a "$L/session.log"
  return $rc
}
if run sanity 300 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((256,256)).sum()))"; then
  export DAU_BENCH_BACKEND_WAIT_S=120
fi
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
# 1. official capture FIRST (headline flushes before variants since r5;
#    warms every compile the driver's round-end capture needs)
run bench_default 2400 python bench.py
# 2. trained-network evidence (verdict item 5): 1k steps, ckpt+resume
run train_small_1k 2400 python examples/train_alexnet_synth.py --steps 1000
# 3. compiled numerics of the blocked-dot factored kernel (verdict item 2)
run oracle_factored 1800 python benchmarks/tpu_oracle_check.py factored
# 4. factored-vs-phi standalone A/Bs (recalibrates FACTORED_MIN_BINS)
run factored_conv4 1200 python benchmarks/fused_bwd_probe.py --gather factored conv4
run factored_conv2 1200 python benchmarks/fused_bwd_probe.py --gather factored conv2
run phi_conv4 1200 python benchmarks/fused_bwd_probe.py conv4
# 5. tier re-jit payoff on the layer bench (verdict item 7)
run layer_off3 1200 python bench.py --model layer
run layer_off2 1200 python bench.py --model layer --static-max-offset 2
# 6. in-step A/B for the auto gather (only meaningful if step 4 wins)
run bench_auto_gather 2400 python bench.py --fused-gather auto
echo "SESSION-DONE $(date +%H:%M:%S)" | tee -a "$L/session.log"
