"""Utilities: profiling/timing harnesses (SURVEY.md §6.1)."""

from trcnn.utils.profiling import time_fn, trace_to, op_time_breakdown

__all__ = ["time_fn", "trace_to", "op_time_breakdown"]
