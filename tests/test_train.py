"""Training-layer tests: optimizer param groups, freezing, train step on a
virtual mesh, orbax checkpoint save/auto-resume round trip (SURVEY.md
§6.3/§6.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trcnn.config import (FasterRCNNConfig, OptimConfig, ProposalConfig,
                          ProposalTargetConfig)
from trcnn.data import DetectionLoader, SyntheticDetection
from trcnn.models import make_model
from trcnn.train import TrainConfig, Trainer, frozen_mask, make_optimizer
from trcnn.train.optim import bias_mask
from trcnn.train.step import (TrainState, device_batch, make_mesh,
                              make_train_step)


def tiny_cfg():
    return FasterRCNNConfig(
        head_hidden=32, rpn_channels=16,
        proposals=ProposalConfig(pre_nms_topk_train=192, post_nms_topk_train=32,
                                 pre_nms_topk_test=192, post_nms_topk_test=16),
        proposal_targets=ProposalTargetConfig(rois_per_image=8),
        optim=OptimConfig(base_lr=1e-3, total_iters=10),
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = make_model(cfg)
    images = jnp.zeros((2, 64, 96, 3))
    im_info = jnp.asarray([[64.0, 96.0, 1.0]] * 2)
    params = model.init(jax.random.PRNGKey(0), images, im_info)
    return cfg, model, params


def test_frozen_mask_covers_conv1_conv2(model_and_params):
    cfg, model, params = model_and_params
    mask = frozen_mask(params, "vgg16")
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    assert flat["params/extractor/conv1_1/kernel"]
    assert flat["params/extractor/conv2_2/bias"]
    assert not flat["params/extractor/conv3_1/kernel"]
    assert not flat["params/head/fc6/kernel"]


def test_optimizer_freezes_and_doubles_bias_lr(model_and_params):
    cfg, model, params = model_and_params
    tx = make_optimizer(params, cfg.optim, "vgg16")
    state = tx.init(params)
    # fake gradient of ones everywhere, no weight decay interference:
    # check the frozen subtree gets exactly zero update and biases get 2x
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    gp = updates["params"]
    assert float(jnp.abs(gp["extractor"]["conv1_1"]["kernel"]).sum()) == 0.0
    w_upd = float(gp["head"]["cls_score"]["kernel"][0, 0])
    b_upd = float(gp["head"]["cls_score"]["bias"][0])
    # bias has no weight decay and 2x lr: update = -2e-3 exactly;
    # weight update = -(1 + wd*w)*lr
    assert b_upd == pytest.approx(-2e-3, rel=1e-5)
    assert w_upd == pytest.approx(-1e-3 * (1.0 + 5e-4 *
                                           float(params["params"]["head"]
                                                 ["cls_score"]["kernel"][0, 0])),
                                  rel=1e-4)


def _batch(cfg, b=2):
    loader = DetectionLoader(SyntheticDetection(n=4, seed=0, hw_range=((60, 64), (90, 96))),
                             batch_size=b, max_boxes=8, image_cfg=cfg.image,
                             prefetch=0)
    return next(iter(loader))


def test_train_step_on_virtual_mesh(model_and_params):
    cfg, model, params = model_and_params
    cfg = cfg.replace(image=cfg.image.__class__(
        target_min_size=60, target_max_size=96, pad_h=64, pad_w=96))
    mesh = make_mesh(n_data=4, n_model=2)
    tx = make_optimizer(params, cfg.optim, "vgg16")
    state = TrainState.create_sharded(params, tx, mesh)
    step = make_train_step(model, tx, mesh)
    batch = _batch(cfg, b=4)
    db = device_batch(batch, mesh)
    # the step donates its input state — snapshot before calling
    before = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, db, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params actually changed
    d = jax.tree.map(lambda a, b_: float(np.abs(np.asarray(a) - b_).sum()),
                     new_state.params, before)
    assert sum(jax.tree.leaves(d)) > 0


def test_trainer_checkpoint_and_auto_resume(model_and_params, tmp_path):
    cfg, model, params = model_and_params
    cfg = cfg.replace(image=cfg.image.__class__(
        target_min_size=60, target_max_size=96, pad_h=64, pad_w=96))
    ckdir = str(tmp_path / "ck")

    def batches():
        while True:
            yield _batch(cfg)

    t1 = Trainer(model, params, cfg, TrainConfig(
        total_iters=3, log_every=10, checkpoint_every=0,
        checkpoint_dir=ckdir, use_mesh=False))
    t1.fit(batches())
    assert int(t1.state.step) == 3

    # a fresh Trainer over the same dir must auto-resume at step 3
    t2 = Trainer(model, params, cfg, TrainConfig(
        total_iters=5, log_every=10, checkpoint_every=0,
        checkpoint_dir=ckdir, use_mesh=False))
    assert int(t2.state.step) == 3
    np.testing.assert_allclose(
        np.asarray(t2.state.params["params"]["head"]["fc6"]["kernel"]),
        np.asarray(t1.state.params["params"]["head"]["fc6"]["kernel"]),
        rtol=1e-6)
    t2.fit(batches())
    assert int(t2.state.step) == 5


def test_train_step_inner_steps_matches_sequential(model_and_params):
    """make_train_step(inner_steps=K) runs K optimizer steps per dispatch
    (lax.scan) and must reproduce K sequential K=1 calls: same step
    counter, same sampling decisions (the fold-in key is state.step on
    both paths), params equal to numerical tolerance."""
    cfg, model, params = model_and_params
    cfg = cfg.replace(image=cfg.image.__class__(
        target_min_size=60, target_max_size=96, pad_h=64, pad_w=96))
    tx = make_optimizer(params, cfg.optim, "vgg16")
    db = device_batch(_batch(cfg, b=2))
    rng = jax.random.PRNGKey(3)

    step1 = make_train_step(model, tx, donate=False)
    s = TrainState.create(params, tx)
    s, m1 = step1(s, db, rng)
    s, m2 = step1(s, db, rng)

    stepk = make_train_step(model, tx, donate=False, inner_steps=2)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), db)
    sk, mk = stepk(TrainState.create(params, tx), stacked, rng)

    assert int(sk.step) == int(s.step) == 2
    # metrics are the LAST inner step's — sampling decisions must agree
    # exactly with the second sequential step
    assert float(mk["num_fg_rois"]) == float(m2["num_fg_rois"])
    assert float(mk["num_fg_anchors"]) == float(m2["num_fg_anchors"])
    np.testing.assert_allclose(float(mk["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    d = jax.tree.map(
        lambda a, b_: float(np.abs(np.asarray(a, np.float64)
                                   - np.asarray(b_, np.float64)).max()),
        sk.params, s.params)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_sharded_restore_under_new_mesh_topology(model_and_params, tmp_path,
                                                 monkeypatch):
    """Restore-under-mesh drill (VERDICT r4 item 7): save from a Trainer on
    a 4x2 (data, model) mesh, auto-resume into a Trainer on a DIFFERENT
    2x4 topology, and require bit-equal params, correct TP shardings on
    the new mesh, and a further step that moves them.  Orbax
    restore-under-mesh is the classic silent-failure point of the
    checkpoint stack — test_multihost proves the distributed *save* path;
    this pins the sharded *restore* continuation."""
    import trcnn.train.trainer as trainer_mod

    cfg, model, params = model_and_params
    cfg = cfg.replace(image=cfg.image.__class__(
        target_min_size=60, target_max_size=96, pad_h=64, pad_w=96))
    ckdir = str(tmp_path / "ckm")

    def batches():
        while True:
            yield _batch(cfg, b=4)

    monkeypatch.setattr(trainer_mod, "make_mesh",
                        lambda: make_mesh(n_data=4, n_model=2))
    t1 = Trainer(model, params, cfg, TrainConfig(
        total_iters=2, log_every=10, checkpoint_every=0,
        checkpoint_dir=ckdir, use_mesh=True))
    assert dict(t1.mesh.shape) == {"data": 4, "model": 2}
    t1.fit(batches())
    assert int(t1.state.step) == 2
    fc6_saved = np.asarray(t1.state.params["params"]["head"]["fc6"]["kernel"])

    monkeypatch.setattr(trainer_mod, "make_mesh",
                        lambda: make_mesh(n_data=2, n_model=4))
    t2 = Trainer(model, params, cfg, TrainConfig(
        total_iters=3, log_every=10, checkpoint_every=0,
        checkpoint_dir=ckdir, use_mesh=True))
    # auto-resumed at the saved step, onto the NEW mesh topology
    assert int(t2.state.step) == 2
    fc6 = t2.state.params["params"]["head"]["fc6"]["kernel"]
    assert dict(fc6.sharding.mesh.shape) == {"data": 2, "model": 4}
    assert "model" in str(fc6.sharding.spec), (
        "fc6 must stay tensor-parallel-sharded after restore, not get "
        "silently replicated")
    # restore is bit-exact across the topology change
    np.testing.assert_array_equal(np.asarray(fc6), fc6_saved)
    # momentum state restored sharded too (opt_state mirrors param specs)
    mom = jax.tree.leaves(t2.state.opt_state)
    assert all(hasattr(m, "sharding") for m in mom if hasattr(m, "shape"))

    t2.fit(batches())
    assert int(t2.state.step) == 3
    moved = float(np.abs(np.asarray(t2.state.params["params"]["head"]["fc6"]
                                    ["kernel"]) - fc6_saved).sum())
    assert moved > 0.0


def test_coco_config_multiscale_train_step_81_classes():
    """BASELINE config 5's training half: an 81-class head + a MULTISCALE
    loader batch through one real gradient step (the multiscale path had
    only shape tests before — VERDICT r3 item 2).  Tiny canvas keeps it
    CI-cheap; the class count and the per-image scale variation are the
    contract under test."""
    from trcnn.config import ImageConfig, coco_config

    cfg = coco_config().replace(
        head_hidden=32, rpn_channels=16,
        proposals=ProposalConfig(pre_nms_topk_train=192,
                                 post_nms_topk_train=32,
                                 pre_nms_topk_test=192,
                                 post_nms_topk_test=16),
        proposal_targets=ProposalTargetConfig(rois_per_image=8),
        image=ImageConfig(target_min_size=60, target_max_size=96,
                          pad_h=64, pad_w=96,
                          multiscale_min_sizes=(40, 52, 60)),
        optim=OptimConfig(base_lr=1e-3, total_iters=10),
    )
    assert cfg.num_classes == 81
    model = make_model(cfg)
    ds = SyntheticDetection(n=16, num_classes=cfg.num_classes,
                            hw_range=((50, 80), (60, 90)), seed=5)
    loader = DetectionLoader(ds, batch_size=4, max_boxes=8,
                             image_cfg=cfg.image, augment=True,
                             shuffle=True, seed=0, prefetch=0)
    batch = next(iter(loader))
    # multiscale actually sampled different shorter sides in this batch
    shorter = {round(float(min(i[0], i[1]))) for i in batch.im_info}
    assert len(shorter) > 1, f"multiscale produced one scale: {shorter}"

    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.asarray(batch.images),
                                 jnp.asarray(batch.im_info))
    # 81-class head shapes
    assert params["params"]["head"]["cls_score"]["kernel"].shape[-1] == 81
    assert params["params"]["head"]["bbox_pred"]["kernel"].shape[-1] == 324
    tx = make_optimizer(params, cfg.optim, cfg.backbone)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, mesh=None)
    db = {"images": jnp.asarray(batch.images),
          "im_info": jnp.asarray(batch.im_info),
          "gt_boxes": jnp.asarray(batch.gt_boxes),
          "gt_labels": jnp.asarray(batch.gt_labels),
          "gt_valid": jnp.asarray(batch.gt_valid)}
    before = np.asarray(params["params"]["head"]["cls_score"]["kernel"])
    new_state, metrics = step(state, db, jax.random.PRNGKey(1))
    for k in ("loss", "rpn_cls_loss", "rpn_bbox_loss", "cls_loss",
              "bbox_loss"):
        assert np.isfinite(float(metrics[k])), (k, metrics)
    after = np.asarray(new_state.params["params"]["head"]["cls_score"]["kernel"])
    assert np.abs(after - before).max() > 0
