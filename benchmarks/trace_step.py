"""Capture a jax.profiler trace of the AlexNet-DAU fourier train step and
print the top device ops by total duration.

Run on the real chip: python benchmarks/trace_step.py [outdir]
"""

import collections
import glob
import gzip
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")
from dau_convnet_tpu.models import AlexNetDAU  # noqa: E402


def build_step():
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((32, 3, 227, 227)), dtype)
    labels = jnp.asarray(rng.integers(0, 1000, (32,)))
    tx = optax.sgd(1e-4)
    model = AlexNetDAU(variant="default", train=False, dtype=dtype,
                       engine="fourier")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        _, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2

    return step, (params, opt_state)


def summarize(outdir):
    files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files under", outdir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    durs = collections.Counter()
    counts = collections.Counter()
    device_pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                device_pids.add(ev["pid"])
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            name = ev.get("name", "")
            durs[name] += ev.get("dur", 0)
            counts[name] += 1
    total = sum(durs.values())
    print(f"device total (all lanes): {total/1e3:.3f} ms over "
          f"{sum(counts.values())} events")
    for name, d in durs.most_common(40):
        print(f"  {d/1e3:9.3f} ms  x{counts[name]:4d}  {name[:100]}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dau_trace"
    step, carry = build_step()
    carry = step(*carry)  # compile + warm
    jax.block_until_ready(carry)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            carry = step(*carry)
        jax.block_until_ready(carry)
    summarize(outdir)


if __name__ == "__main__":
    main()
