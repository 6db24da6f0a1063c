"""VMEM-budget guard for the hand-written Pallas kernels.

The Pallas engines keep whole flattened planes resident per grid step (see
kernels/forward.py layout notes). That is the right shape for the small/
medium configs they were built to serve, but at large channel counts the
blocks exceed the chip's ~128 MiB VMEM and Mosaic fails late at compile
time with an opaque allocation error. This guard fails FAST at trace time
with an actionable message instead (the reference has the same class of
hard limit: its CUDA engine rejects offsets > 32 px / filters > 17x17 when
constant/shared memory would overflow, dau_conv_forward.cpp:156-158,
convolve.cu:40).
"""

from __future__ import annotations

# conservative vs the 128 MiB per-core VMEM (leave room for Mosaic's
# double-buffering of grid blocks and spills)
VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def check_vmem_budget(engine: str, named_blocks, interpret: bool) -> None:
    """Raise ValueError if the per-grid-step VMEM blocks exceed the budget.

    named_blocks: iterable of (name, n_elements, itemsize).
    No-op in interpret mode (no VMEM there).
    """
    if interpret:
        return
    total = sum(n * itemsize for _, n, itemsize in named_blocks)
    if total > VMEM_BUDGET_BYTES:
        detail = ", ".join(f"{name}={n * itemsize / 2**20:.1f}MiB"
                           for name, n, itemsize in named_blocks)
        raise ValueError(
            f"Pallas engine '{engine}': per-step VMEM blocks need "
            f"{total / 2**20:.1f} MiB (> {VMEM_BUDGET_BYTES / 2**20:.0f} MiB "
            f"budget): {detail}. The hand-written kernels keep whole planes "
            "resident and do not scale to this shape; use engine='xla' or "
            "engine='fourier' (both faster at large shapes), or reduce "
            "channels/spatial size.")
