"""Debug/sanitizer modes (SURVEY.md §6.2).

The reference has no sanitizers (single-threaded python + race-free CUDA
bitmask kernel); the JAX-native equivalents are config switches:

  * ``nan_debug()``        — jax_debug_nans: every jitted op re-runs
    un-jitted on NaN and raises at the producing op;
  * ``no_jit()``           — jax_disable_jit: op-by-op eager execution
    (python-level debugging of traced code);
  * ``pallas_interpret()`` — force Pallas kernels through the interpreter
    (the kernel "sanitizer" path; runs on CPU, used in CI).

All are context managers and compose.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def nan_debug():
    import jax

    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


@contextlib.contextmanager
def no_jit():
    import jax

    with jax.disable_jit():
        yield


@contextlib.contextmanager
def pallas_interpret():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield
