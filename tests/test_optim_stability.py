"""From-scratch deep-backbone training stability (round-3 ledger NaN fix).

The r3 perf ledger caught ``train_r101_b8`` diverging to NaN in 2 steps at
random init: 30+ residual adds compound activation variance (cls_loss 356
at step 0, grad_norm ~1.9e4), and lr 1e-3 destroys the params in one
update.  Three guards, each tested here:

  * zero-gamma residual init — every Bottleneck is identity at init
    (Goyal et al. 2017 §5.1), so random-init activations stay unit-scale;
  * optional linear lr warmup (OptimConfig.warmup_steps/warmup_factor);
  * optional global-norm gradient clipping (OptimConfig.clip_grad_norm).

Defaults keep both knobs OFF (reference VGG schedule parity, SURVEY.md §8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trcnn.config import OptimConfig
from trcnn.models.resnet import Bottleneck, ResStage
from trcnn.train.optim import make_optimizer, make_schedule

# fast marks are per-test: the heaviest cases (>15 s on the 1-CPU box)
# run in the full suite only, keeping `pytest -m fast` inside its
# 5-minute budget (VERDICT r3 weak 5).


@pytest.mark.fast
def test_bottleneck_is_identity_at_random_init():
    """zero-gamma: a non-projecting block at init returns relu(x) exactly."""
    blk = Bottleneck(channels=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 6, 32), jnp.float32)
    params = blk.init(jax.random.PRNGKey(1), x)
    y = blk.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y), np.maximum(np.asarray(x), 0))


@pytest.mark.fast
def test_resstage_activation_scale_stays_bounded_at_init():
    """A deep random-init stage must not amplify activation scale: with
    zero-gamma only the (projected) first block transforms the signal."""
    stage = ResStage(blocks=8, channels=8, stride=1)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16), jnp.float32)
    params = stage.init(jax.random.PRNGKey(0), x)
    y = np.asarray(stage.apply(params, x))
    assert np.isfinite(y).all()
    assert y.std() < 4 * np.asarray(x).std()


@pytest.mark.fast
def test_warmup_schedule_values():
    cfg = OptimConfig(base_lr=1e-3, warmup_steps=100, warmup_factor=1 / 3,
                      lr_decay_step=1000, lr_decay_factor=0.1)
    s = make_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 1e-3 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 1e-3 * (1 / 3 + 2 / 3 * 0.5),
                               rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(500)), 1e-3, rtol=1e-6)
    # decay still applies after warmup
    np.testing.assert_allclose(float(s(1500)), 1e-4, rtol=1e-6)


@pytest.mark.fast
def test_warmup_disabled_by_default_matches_reference_schedule():
    cfg = OptimConfig()
    s = make_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), cfg.base_lr, rtol=1e-7)
    np.testing.assert_allclose(float(s(cfg.lr_decay_step + 1)),
                               cfg.base_lr * cfg.lr_decay_factor, rtol=1e-6)


def test_residual_branch_trains_from_scratch_under_frozen_bn_mask():
    """ADVICE r3 (high): zero-init on a FROZEN bn3 scale would cut the
    conv1/conv2 gradient path of every non-projecting Bottleneck for the
    whole run.  The fix puts the zero on the TRAINABLE conv3 kernel; this
    drives a few real masked-SGD steps and asserts the residual branch
    (conv1/conv2/conv3) actually moves while every FrozenBN leaf stays put.
    """
    import flax

    stage = ResStage(blocks=2, channels=4, stride=1)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 8), jnp.float32)
    # wrap in the model's param topology so frozen_mask's resnet rules
    # ('bn' subtrees freeze; res3+ trains) apply exactly as in training
    params = {"params": {"extractor": {
        "res3": stage.init(jax.random.PRNGKey(0), x)["params"]}}}
    tgt = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 16), jnp.float32)

    def loss_fn(p):
        y = stage.apply({"params": p["params"]["extractor"]["res3"]}, x)
        return jnp.mean((y - tgt) ** 2)

    from trcnn.train.optim import frozen_mask

    tx = make_optimizer(params, OptimConfig(base_lr=0.05, weight_decay=0.0),
                        backbone="resnet101")
    state = tx.init(params)
    p = params
    for _ in range(3):
        grads = jax.grad(loss_fn)(p)
        updates, state = tx.update(grads, state, p)
        import optax

        p = optax.apply_updates(p, updates)

    blk0 = params["params"]["extractor"]["res3"]["block2"]
    blk3 = p["params"]["extractor"]["res3"]["block2"]
    # conv3 leaves its zero init after step 1; conv1/conv2 move once conv3
    # is nonzero (their step-0 grad is exactly zero by construction)
    for conv in ("conv1", "conv2", "conv3"):
        delta = np.abs(np.asarray(blk3[conv]["kernel"])
                       - np.asarray(blk0[conv]["kernel"])).max()
        assert delta > 0, f"{conv} never updated: residual branch is dead"
    # and the FrozenBN leaves are genuinely frozen
    flat0 = flax.traverse_util.flatten_dict(params["params"])
    flat3 = flax.traverse_util.flatten_dict(p["params"])
    for k in flat0:
        if any("bn" in str(part) for part in k):
            np.testing.assert_array_equal(np.asarray(flat0[k]),
                                          np.asarray(flat3[k]))


@pytest.mark.fast
def test_warmup_past_decay_step_cannot_exceed_decayed_lr():
    """ADVICE r3 (low): a warmup window extending past lr_decay_step used to
    multiply the decayed lr by the ramp; now the decayed schedule caps it."""
    cfg = OptimConfig(base_lr=1e-3, warmup_steps=2000, warmup_factor=1 / 3,
                      lr_decay_step=1000, lr_decay_factor=0.1)
    s = make_schedule(cfg)
    # before decay: plain ramp toward base_lr
    np.testing.assert_allclose(float(s(0)), 1e-3 / 3, rtol=1e-6)
    # after decay: capped at the decayed lr even though the ramp continues
    assert float(s(1500)) <= 1e-4 * (1 + 1e-6)
    np.testing.assert_allclose(float(s(1999)), 1e-4, rtol=1e-6)


@pytest.mark.fast
def test_clip_grad_norm_bounds_update():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    huge = {"w": jnp.full((4, 4), 1e6), "b": jnp.full((4,), 1e6)}
    cfg = OptimConfig(clip_grad_norm=1.0, weight_decay=0.0)
    tx = make_optimizer(params, cfg)
    state = tx.init(params)
    updates, _ = tx.update(huge, state, params)
    # grads clipped to global norm 1 BEFORE lr/momentum: |update| ≤ 2*lr
    # (bias group runs at 2x lr)
    assert float(optax_global_norm(updates)) <= 2 * cfg.base_lr * 1.001


def optax_global_norm(tree):
    import optax

    return optax.global_norm(tree)
