"""Sharded train/eval steps over a device mesh.

The reference is single-GPU with four host↔device round-trips per
iteration (SURVEY.md §4.2); here one jitted step consumes a batch already
on device and runs forward + backward + update in a single XLA program.
Scale-out is pure data parallelism over a ``jax.sharding.Mesh`` axis
``data`` (SURVEY.md §3.5): batch arrays shard over it, parameters and
optimizer state replicate, and the gradient all-reduce is inserted by the
compiler and rides the ICI.

A ``model`` mesh axis is created (size 1 by default) so the fc6 weight —
the one tensor worth sharding at this scale (SURVEY.md §3.5 TP row) — can
be sharded without re-plumbing when running very small per-chip memory.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        # copy: the train step donates its input state, which would
        # otherwise delete the caller's param buffers out from under them
        params = jax.tree.map(lambda x: jnp.asarray(x).copy(), params)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))

    @classmethod
    def create_sharded(cls, params, tx: optax.GradientTransformation,
                       mesh: Mesh) -> "TrainState":
        """Create with params placed per ``param_shardings``; the optimizer
        state inherits matching shardings through jit propagation."""
        placed = jax.device_put(params, param_shardings(params, mesh))
        return jax.jit(lambda p: cls.create(p, tx))(placed)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """(data, model) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    devices = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh):
    """Parameter sharding tree: replicate everything except the fc6/fc7
    kernels, which shard over the ``model`` axis (Megatron-style column
    then row parallel — fc6 is the one tensor at this scale worth
    sharding, SURVEY.md §3.5 TP row).  With mesh model=1 this degenerates
    to full replication at zero cost."""

    def rule(path, leaf):
        names = [getattr(k, "key", None) for k in path]
        if "fc6" in names and names[-1] == "kernel":
            return NamedSharding(mesh, P(None, "model"))
        if "fc7" in names and names[-1] == "kernel":
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def device_batch(batch, mesh: Optional[Mesh] = None,
                 image_dtype=None) -> Dict[str, jnp.ndarray]:
    """Strip host-only fields and put the batch on device (sharded on
    ``data`` when a mesh is given).

    ``image_dtype``: cast images on the HOST before upload.  When the
    model computes in bf16 the f32 canvas is cast down at the first conv
    anyway, so uploading bf16 halves the host→device bytes at zero model
    impact (this environment's tunneled chip moves ~45 MB/s, making the
    80 MB f32 batch-8 canvas the training bottleneck).
    """
    images = batch.images
    if np.asarray(images).dtype == np.uint8:
        image_dtype = None  # uint8 transfer path: ship as-is
    if image_dtype is not None:
        import ml_dtypes  # numpy bf16 support, ships with jax

        np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16,
                    jnp.float16: np.float16,
                    jnp.float32: np.float32}.get(image_dtype, image_dtype)
        images = np.asarray(images).astype(np_dtype)
    arrays = {
        "images": images,
        "im_info": batch.im_info,
        "gt_boxes": batch.gt_boxes,
        "gt_labels": batch.gt_labels,
        "gt_valid": batch.gt_valid,
    }
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in arrays.items()}
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        # multi-host: this process holds only its shard of the global
        # batch (the loader shards example ids by process_index); lift it
        # into a global array spanning the whole mesh
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in arrays.items()}
    return {k: jax.device_put(v, sh) for k, v in arrays.items()}


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    inner_steps: int = 1,
) -> Callable:
    """Build the jitted train step: (state, batch_dict, rng) → (state, metrics).

    With a mesh, state/rng replicate and the batch shards over ``data``;
    without one it is a plain single-device jit (CPU config-1 path).

    ``inner_steps > 1``: the returned callable runs K optimizer steps per
    dispatch via ``lax.scan``; every array in ``batch_dict`` must then
    carry a leading (K, ...) axis (one slice per inner step) and the
    returned metrics are the LAST inner step's.  One dispatch + one host
    sync per K steps amortizes per-call dispatch latency (~6 ms/step
    through the tunneled chip at the b8 VGG shape — the wall-vs-XLA-rail
    gap in NOTES_ROUND5).  Per-step RNG stays identical to the K=1 path:
    the fold-in key is ``state.step``, which increments inside the scan.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)
        drop_rng, samp_rng = jax.random.split(step_rng)

        def loss_fn(params):
            out = model.apply(
                params, batch["images"], batch["im_info"], batch["gt_boxes"],
                batch["gt_labels"], batch["gt_valid"], method="losses",
                rngs={"dropout": drop_rng, "sampling": samp_rng})
            return out["loss"], out

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    # Shardings flow from the committed placement of the inputs: the state
    # is created via TrainState.create_sharded (params replicated, fc6/fc7
    # TP-sharded over 'model') and device_batch shards arrays over 'data';
    # jit propagates both and inserts the gradient all-reduce.
    if inner_steps == 1:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def step_k(state: TrainState, batches: Dict[str, jnp.ndarray],
               rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def body(s, b):
            return step(s, b, rng)

        state, ms = jax.lax.scan(body, state, batches)
        return state, jax.tree.map(lambda x: x[-1], ms)

    return jax.jit(step_k, donate_argnums=(0,) if donate else ())


def make_detect_step(model, cfg, mesh: Optional[Mesh] = None,
                     score_thresh: Optional[float] = None) -> Callable:
    """Jitted full-inference step: (params, images, im_info) → Detections.

    Backbone→RPN→proposals→RoI head→decode→per-class NMS in ONE XLA
    program (the north-star single-graph requirement, BASELINE.json).
    """
    from trcnn.models.faster_rcnn import postprocess

    def run(params, images, im_info):
        raw = model.apply(params, images, im_info, method="detect")
        return postprocess(raw, im_info, cfg, score_thresh=score_thresh)

    if mesh is None:
        return jax.jit(run)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(run, in_shardings=(repl, bsh, bsh), out_shardings=bsh)
