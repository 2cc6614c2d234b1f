"""Parallelism: multi-host init, mesh construction, and sharding rules.

The reference is single-process single-GPU (SURVEY.md §3.5); this package
is the TPU-native scale-out surface:

  * :func:`initialize` — ``jax.distributed.initialize()`` wiring so the
    same mesh code spans hosts: ICI within a slice, DCN across slices
    (SURVEY.md §6.8).  Call before any other jax API.
  * ``make_mesh(n_data, n_model)`` — a 2-axis ``(data, model)``
    jax.sharding.Mesh over ALL devices (local on one host, global after
    :func:`initialize`).
  * ``batch_sharding`` / ``replicated`` — NamedShardings for batch arrays
    (shard over ``data``) and parameters/optimizer state (replicated).
  * ``param_shardings`` — parameter tree rules: everything replicated
    except fc6/fc7, which shard Megatron-style over ``model``
    (column-parallel then row-parallel; the single weight worth sharding
    at this model scale).
  * ``device_batch`` — host batch → global device arrays; under
    multi-process it assembles each process's local shard into one global
    array via ``jax.make_array_from_process_local_data``.

Gradient all-reduce and the fc7 partial-sum reduction are inserted by XLA
from these shardings — no hand-written collectives (SURVEY.md §6.8).
"""

from __future__ import annotations

from typing import Optional, Sequence


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Start the JAX distributed runtime for multi-host training.

    Args mirror ``jax.distributed.initialize``; with all None the
    environment (TPU metadata / cluster env vars) auto-detects — on Cloud
    TPU pods no arguments are needed.  For explicit CPU/GPU clusters pass
    ``coordinator_address='host:port'`` + ``num_processes`` +
    ``process_id``.  After this, ``jax.devices()`` is the GLOBAL device
    list and the (data, model) mesh from :func:`make_mesh` spans hosts;
    per-host input feeding goes through :func:`device_batch`, which lifts
    each process's local batch shard into the global array.

    Idempotent: a second call is a no-op (jax raises if re-initialized).
    """
    import jax

    if getattr(initialize, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    initialize._done = True


def is_main_process() -> bool:
    """True on the process that should own logging/checkpoint-metadata."""
    import jax

    return jax.process_index() == 0


from trcnn.train.step import (batch_sharding, device_batch, make_mesh,
                              param_shardings, replicated)

__all__ = [
    "initialize",
    "is_main_process",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "device_batch",
]
