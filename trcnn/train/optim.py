"""Optimizer: MomentumSGD with Caffe parameter-group semantics.

SURVEY.md §8 "Optimizer": lr 1e-3, momentum 0.9, weight decay 5e-4, ×0.1
at 50k iters, 70k total, plus the py-faster-rcnn/Caffe per-parameter rules
the Chainer reference inherits:

  * biases train at 2× the learning rate and take no weight decay
    (Caffe ``lr_mult: 2, decay_mult: 0`` on every bias blob);
  * conv1_1–conv2_2 of VGG-16 are frozen (SURVEY.md §8 "Heads init");
    for ResNet-101, conv1 + res2 + every FrozenBatchNorm subtree freeze
    (Detectron lineage).

Freezing is a hard zero-gradient mask (optax.masked set_to_zero), the
functional-JAX equivalent of the reference's per-link ``disable_update``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from trcnn.config import OptimConfig
from trcnn.models.vgg16 import FROZEN_PREFIXES as VGG_FROZEN

RESNET_FROZEN_PREFIXES = ("conv1", "bn1", "res2")


def _path_names(path) -> list:
    return [getattr(k, "key", getattr(k, "idx", None)) for k in path]


def frozen_mask(params, backbone: str = "vgg16") -> Any:
    """True for every leaf whose update must be zeroed (frozen)."""
    if backbone == "vgg16":
        prefixes = VGG_FROZEN
        freeze_bn = False
    else:
        prefixes = RESNET_FROZEN_PREFIXES
        freeze_bn = True

    def is_frozen(path, _leaf) -> bool:
        names = _path_names(path)
        in_extractor = "extractor" in names
        if in_extractor:
            i = names.index("extractor")
            sub = names[i + 1:]
            if sub and any(str(sub[0]).startswith(p) for p in prefixes):
                return True
        if freeze_bn and any("bn" in str(n) for n in names if n is not None):
            return True
        return False

    return jax.tree_util.tree_map_with_path(is_frozen, params)


def bias_mask(params) -> Any:
    """True for bias-like leaves (rank ≤ 1): Caffe's 2×-lr / no-decay group."""
    return jax.tree.map(lambda x: x.ndim <= 1, params)


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    base = optax.piecewise_constant_schedule(
        cfg.base_lr, {cfg.lr_decay_step: cfg.lr_decay_factor})
    if cfg.warmup_steps <= 0:
        return base

    def with_warmup(step):
        frac = jnp.minimum(step / cfg.warmup_steps, 1.0)
        scale = cfg.warmup_factor + (1.0 - cfg.warmup_factor) * frac
        # the ramp targets base_lr, and the decayed schedule caps it — so a
        # warmup configured past lr_decay_step cannot silently re-scale the
        # decayed lr (ADVICE r3)
        return jnp.minimum(base(step), cfg.base_lr * scale)

    return with_warmup


def make_optimizer(
    params,
    cfg: OptimConfig = OptimConfig(),
    backbone: str = "vgg16",
) -> optax.GradientTransformation:
    """The full update rule.  Order matters:
    weight-decay (weights only) → lr schedule (2× on biases) → momentum →
    freeze mask.

    The learning rate scales the gradient BEFORE the momentum trace —
    Caffe/Chainer MomentumSGD semantics (v = m·v − lr·(g + wd·w); w += v).
    At the ×0.1 decay step the accumulated velocity then decays over
    ~1/(1−m) steps exactly as the reference does, instead of being
    instantly rescaled (ADVICE r1)."""
    biases = bias_mask(params)
    weights = jax.tree.map(lambda b: not b, biases)
    frozen = frozen_mask(params, backbone)

    schedule = make_schedule(cfg)
    bias_schedule = lambda step: 2.0 * schedule(step)

    clip = (optax.clip_by_global_norm(cfg.clip_grad_norm)
            if cfg.clip_grad_norm > 0 else optax.identity())
    tx = optax.chain(
        clip,
        optax.masked(optax.add_decayed_weights(cfg.weight_decay), weights),
        optax.masked(optax.scale_by_learning_rate(schedule), weights),
        optax.masked(optax.scale_by_learning_rate(bias_schedule), biases),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.masked(optax.set_to_zero(), frozen),
    )
    return tx
