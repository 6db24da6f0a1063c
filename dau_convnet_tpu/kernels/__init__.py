from .backward import grad_tables_pallas
from .forward import aggregate_forward_pallas, dau_forward_fused_pallas

__all__ = [
    "aggregate_forward_pallas",
    "dau_forward_fused_pallas",
    "grad_tables_pallas",
]
