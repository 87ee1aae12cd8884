from .argmax import argmax_per_group
from .runs import longest_consecutive_run
from .topk import top_k_global, top_k_per_group

__all__ = [
    "argmax_per_group",
    "longest_consecutive_run",
    "top_k_global",
    "top_k_per_group",
]
