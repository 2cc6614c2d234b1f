"""Utilities: profiling/timing harnesses (§6.1) + debug modes (§6.2)."""

from trcnn.utils.profiling import time_fn, trace_to, op_time_breakdown
from trcnn.utils.debug import nan_debug, no_jit, pallas_interpret

__all__ = ["time_fn", "trace_to", "op_time_breakdown",
           "nan_debug", "no_jit", "pallas_interpret"]
