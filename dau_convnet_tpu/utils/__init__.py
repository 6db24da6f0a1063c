from .tiers import (
    KERNEL_TIERS,
    MAX_SUPPORTED_OFFSET,
    snap_kernel_tier,
    tier_for_params,
)

__all__ = [
    "KERNEL_TIERS",
    "MAX_SUPPORTED_OFFSET",
    "snap_kernel_tier",
    "tier_for_params",
]
