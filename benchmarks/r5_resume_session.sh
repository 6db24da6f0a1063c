#!/bin/bash
# Round-5 resume: the A/B queue items interrupted mid-session (bench_default
# and train_small_1k already captured in /tmp/r5logs). Same run() contract
# as r5_chip_session.sh.
cd "$(dirname "$0")/.."
L=${DAU_PROBE_LOGDIR:-/tmp/r5logs}
mkdir -p "$L"
run() {
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$L/session.log"
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc $(date +%H:%M:%S)" | tee -a "$L/session.log"
  return $rc
}
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
# 3. compiled numerics of the blocked-dot factored kernel (verdict item 2)
run oracle_factored 2400 python benchmarks/tpu_oracle_check.py factored
# 4. factored-vs-phi standalone A/Bs (recalibrates FACTORED_MIN_BINS)
run factored_conv4_conv2 2400 python benchmarks/fused_bwd_probe.py --gather factored conv4 conv2
run phi_conv4_conv2 1800 python benchmarks/fused_bwd_probe.py conv4 conv2
# 5. tier re-jit payoff on the layer bench (verdict item 7)
run layer_off3 1500 python bench.py --model layer
run layer_off2 1500 python bench.py --model layer --static-max-offset 2
echo "RESUME-SESSION-DONE $(date +%H:%M:%S)" | tee -a "$L/session.log"
