"""Parallelism: mesh construction and sharding rules.

The reference is single-process single-GPU (SURVEY.md §3.5); this package
is the TPU-native scale-out surface:

  * ``make_mesh(n_data, n_model)`` — a 2-axis ``(data, model)``
    jax.sharding.Mesh over the local devices (ICI within a slice; add
    ``jax.distributed.initialize()`` for multi-host and the same code
    spans DCN).
  * ``batch_sharding`` / ``replicated`` — NamedShardings for batch arrays
    (shard over ``data``) and parameters/optimizer state (replicated).
  * ``param_shardings`` — parameter tree rules: everything replicated
    except fc6/fc7, which shard Megatron-style over ``model``
    (column-parallel then row-parallel; the single weight worth sharding
    at this model scale).

Gradient all-reduce and the fc7 partial-sum reduction are inserted by XLA
from these shardings — no hand-written collectives (SURVEY.md §6.8).
"""

from trcnn.train.step import (batch_sharding, device_batch, make_mesh,
                              param_shardings, replicated)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "device_batch",
]
