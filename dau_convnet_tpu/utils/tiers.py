"""Kernel-tier selection: trace-time replacement of the reference dispatcher.

The reference picks a CUDA kernel tier at every op call by reading
max|mu| back from the device (`caffe_gpu_amax` -> snap kernel to
{9, 17, 33, 65}, dau_conv_op.cpp:223-256 and dau_conv_forward.cpp:147-159).
Under XLA's compilation model that data-dependent dispatch becomes a
*static* choice: callers who know their offsets are bounded pick a tier at
trace time (`DAUConvSettings.static_max_offset`), optionally re-jitting
between epochs if offsets grow (`tier_for_params` on concrete params).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["KERNEL_TIERS", "snap_kernel_tier", "tier_for_params",
           "max_offset_in_tree", "tier_for_tree", "retier_offset",
           "MAX_SUPPORTED_OFFSET"]

# same tiers as the reference CUDA engine (dau_conv_forward.cpp:147-159)
KERNEL_TIERS = (9, 17, 33, 65)

# reference hard limit: offsets beyond 32 px are unsupported
# (dau_conv_forward.cpp:156-158). We keep the same documented contract.
MAX_SUPPORTED_OFFSET = 32.0


def snap_kernel_tier(max_offset: float) -> int:
    """Smallest tier whose kernel covers the given absolute offset bound
    (reference rule: kernel >= 2*offset + 1, dau_conv_forward.cpp:163-164)."""
    if max_offset > MAX_SUPPORTED_OFFSET:
        raise ValueError(
            f"max offset {max_offset} exceeds the supported bound "
            f"{MAX_SUPPORTED_OFFSET} (reference tier limit)")
    need = 2 * int(math.ceil(max_offset)) + 1
    for tier in KERNEL_TIERS:
        if tier >= need:
            return tier
    return KERNEL_TIERS[-1]


def tier_for_params(mu1, mu2) -> int:
    """Tier for concrete (host) mu arrays - the reference's amax dispatch,
    evaluated between jit regions instead of inside them."""
    bound = float(max(np.abs(np.asarray(mu1)).max(),
                      np.abs(np.asarray(mu2)).max()))
    return snap_kernel_tier(bound)


def max_offset_in_tree(params) -> float:
    """max |mu| over every mu1/mu2 leaf of a flax params pytree.

    Host-side companion of the reference's per-step `caffe_gpu_amax` readback
    (dau_conv_op.cpp:224-236) for whole-model re-jit workflows: call between
    jit steps on concrete params, then rebuild the model with
    `static_max_offset=math.ceil(result)` (or `snap_kernel_tier`) when the
    tier changed. See examples/train_cifar10.py for the loop."""
    import jax

    worst = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        if name in ("mu1", "mu2"):
            worst = max(worst, float(np.abs(np.asarray(leaf)).max()))
    return worst


def tier_for_tree(params) -> int:
    """Kernel tier covering every DAU layer in a params pytree."""
    return snap_kernel_tier(max_offset_in_tree(params))


def retier_offset(live: float, current: float, kernel_size: int,
                  slack: float = 0.5):
    """Between-jit-steps re-tier policy: the host-side replacement for the
    reference's per-step amax dispatch (dau_conv_op.cpp:223-256), both
    directions.

    `live` is max|mu| over the concrete params, `current` the model's
    static_max_offset. Returns the new static_max_offset when the model
    should be re-jitted, else None:

    - GROW immediately when live exceeds the current promise (correctness:
      the op clips |mu| to the static bound, so exceeding it silently
      saturates positions).
    - SHRINK only when the snapped bound ceil(live + slack) drops below the
      current one (a perf optimization: smaller synthesized aggregation
      kernel / fewer fourier bins). The +slack inside the ceil gives ~1.5px
      of hysteresis against drift-flapping between two adjacent bounds.
    """
    cap = kernel_size // 2
    snapped = float(min(math.ceil(live + slack), cap))
    if snapped != current and (live > current or snapped < current):
        return snapped
    return None
