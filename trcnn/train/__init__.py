"""Training layer: optimizer schedule, sharded train step, checkpointing.

Rebuild of the reference's train.py + Chainer Trainer stack (SURVEY.md
§3.4, §4.2) as a functional JAX pipeline: optax MomentumSGD with the
py-faster-rcnn parameter-group rules, a pjit-sharded train step over a
``jax.sharding.Mesh`` (data-parallel batch axis — the scale-out path the
reference lacks, SURVEY.md §3.5), orbax checkpointing, and clu metrics.
"""

from trcnn.train.optim import make_optimizer, frozen_mask
from trcnn.train.step import TrainState, make_train_step, make_mesh
from trcnn.train.trainer import Trainer, TrainConfig

__all__ = [
    "make_optimizer",
    "frozen_mask",
    "TrainState",
    "make_train_step",
    "make_mesh",
    "Trainer",
    "TrainConfig",
]
