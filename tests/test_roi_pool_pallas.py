"""Pallas RoI-pool kernel parity (interpret mode on CPU — SURVEY.md §6.2).

Forward vs the numpy Caffe-f32-bin-math oracle; backward vs the numpy
single-winner argmax-scatter oracle AND the XLA formulation's custom VJP
(the reference's saved-argmax semantics — contract re-pinned in round 5,
see trcnn/ops/roi_pool.py module docstring)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trcnn.ops.roi_pool import (roi_max_pool, roi_max_pool_oracle_numpy,
                                roi_pool_backward_oracle_numpy)
from trcnn.ops.roi_pool_pallas import roi_max_pool_pallas


def _fixture(seed, B=2, H=38, W=64, C=16, R=24):
    r = np.random.RandomState(seed)
    feat = r.randn(B, H, W, C).astype(np.float32)
    x1 = r.uniform(0, 900, (B, R))
    y1 = r.uniform(0, 500, (B, R))
    rois = np.stack([x1, y1,
                     np.minimum(x1 + r.uniform(5, 600, (B, R)), 1015),
                     np.minimum(y1 + r.uniform(5, 400, (B, R)), 599)],
                    -1).astype(np.float32)
    return feat, rois


def test_forward_matches_oracle_interpret():
    feat, rois = _fixture(0)
    got = np.asarray(roi_max_pool_pallas(
        jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, True))
    for b in range(feat.shape[0]):
        np.testing.assert_allclose(
            got[b], roi_max_pool_oracle_numpy(feat[b], rois[b]), atol=1e-5)


def test_backward_matches_xla_vjp_interpret():
    # C=512 also exercises the 256-channel grid blocking
    feat, rois = _fixture(1, C=512, R=12)
    g = np.random.RandomState(2).randn(
        feat.shape[0], rois.shape[1], 7, 7, feat.shape[-1]).astype(np.float32)
    d_pal = jax.vjp(
        lambda f: roi_max_pool_pallas(f, jnp.asarray(rois), 7, 1 / 16.0, True),
        jnp.asarray(feat))[1](jnp.asarray(g))[0]
    xla = jax.vmap(functools.partial(roi_max_pool, out_size=7,
                                     spatial_scale=1 / 16.0))
    d_xla = jax.vjp(lambda f: xla(f, jnp.asarray(rois)),
                    jnp.asarray(feat))[1](jnp.asarray(g))[0]
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_xla),
                               atol=1e-4)


def test_backward_matches_numpy_oracle_interpret():
    """Kernel gradient vs the literal-loop single-winner numpy oracle,
    including engineered exact ties (constant blocks -> many tied cells)."""
    feat, rois = _fixture(5, C=16, R=10)
    # carve constant plateaus so exact ties are guaranteed in-band
    feat[:, 4:12, 6:20, :] = 3.0
    feat[:, 20:30, 30:50, :] = 7.0
    g = np.random.RandomState(6).randn(
        feat.shape[0], rois.shape[1], 7, 7, feat.shape[-1]).astype(np.float32)
    d_pal = np.asarray(jax.vjp(
        lambda f: roi_max_pool_pallas(f, jnp.asarray(rois), 7, 1 / 16.0, True),
        jnp.asarray(feat))[1](jnp.asarray(g))[0])
    for b in range(feat.shape[0]):
        want = roi_pool_backward_oracle_numpy(feat[b], rois[b], g[b])
        np.testing.assert_allclose(d_pal[b], want, atol=1e-4)


def test_backward_single_winner_tie_interpret():
    """Re-pinned contract (VERDICT r4 item 2): a tied bin max routes the
    WHOLE gradient to one argmax cell — first maximal column, then first
    row within it — matching the reference's saved-argmax scatter instead
    of the old even tie-split XLA-VJP artifact."""
    feat = np.zeros((1, 38, 64, 8), np.float32)
    # column tie: (2,2) and (2,3) share the max of bin (0,0) -> column 2
    # wins, full mass to (2,2)
    feat[0, 2, 2, :] = 5.0
    feat[0, 2, 3, :] = 5.0
    rois = np.asarray([[[0.0, 0.0, 1015.0, 599.0]]], np.float32)
    g = np.zeros((1, 1, 7, 7, 8), np.float32)
    g[0, 0, 0, 0] = 2.0  # bin (0,0) spans rows 0..5, cols 0..9
    d = np.asarray(jax.vjp(
        lambda f: roi_max_pool_pallas(f, jnp.asarray(rois), 7, 1 / 16.0, True),
        jnp.asarray(feat))[1](jnp.asarray(g))[0])
    np.testing.assert_allclose(d[0, 2, 2], 2.0)
    np.testing.assert_allclose(d[0, 2, 3], 0.0)
    assert np.abs(d).sum() == np.abs(d[0, 2, 2]).sum()

    # row tie within one column: (2,2) vs (4,2) -> first row (2) wins
    feat2 = np.zeros((1, 38, 64, 8), np.float32)
    feat2[0, 2, 2, :] = 5.0
    feat2[0, 4, 2, :] = 5.0
    d2 = np.asarray(jax.vjp(
        lambda f: roi_max_pool_pallas(f, jnp.asarray(rois), 7, 1 / 16.0, True),
        jnp.asarray(feat2))[1](jnp.asarray(g))[0])
    np.testing.assert_allclose(d2[0, 2, 2], 2.0)
    np.testing.assert_allclose(d2[0, 4, 2], 0.0)
    # XLA formulation agrees bit-for-bit on both tie cases
    for f_, d_ in ((feat, d), (feat2, d2)):
        d_xla = np.asarray(jax.vjp(
            lambda f: roi_max_pool(f[0], jnp.asarray(rois[0])),
            jnp.asarray(f_))[1](jnp.asarray(g[0]))[0])
        np.testing.assert_allclose(d_[0], d_xla[0], atol=0)


def test_backward_unaligned_width_interpret():
    """W not a multiple of 8 runs the kernels at the -inf-padded sublane
    width (round 5: the full-width stage-B fallback at COCO's W=84 map
    made the forward kernel 14.1 ms/b4, ~27x off roofline).  Backward
    gradient at an unaligned width vs the numpy oracle, ties included."""
    feat, rois = _fixture(9, B=1, H=30, W=44, C=16, R=8)
    feat[:, 5:12, 8:30, :] = 2.5
    g = np.random.RandomState(10).randn(1, 8, 7, 7, 16).astype(np.float32)
    d_pal = np.asarray(jax.vjp(
        lambda f: roi_max_pool_pallas(f, jnp.asarray(rois), 7, 1 / 16.0,
                                      True),
        jnp.asarray(feat))[1](jnp.asarray(g))[0])
    want = roi_pool_backward_oracle_numpy(feat[0], rois[0], g[0])
    np.testing.assert_allclose(d_pal[0], want, atol=1e-4)


def test_forward_portrait_canvas_interpret():
    """Portrait feature map (64x38): max bin extent 11 -> a 4-level sparse
    table and multi-channel-block grid (the shape whose VMEM footprint
    broke the round-2 train compile before the 4 MB block budget)."""
    feat, rois = _fixture(3, H=64, W=38, C=256)
    got = np.asarray(roi_max_pool_pallas(
        jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, True))
    for b in range(feat.shape[0]):
        np.testing.assert_allclose(
            got[b], roi_max_pool_oracle_numpy(feat[b], rois[b]), atol=1e-5)


def test_flat_out_matches_5d_interpret():
    """flat_out=True is a pure re-layout of the standard output (the
    (cbi, ph, pw, cw) lane order of flat_lane_groups), and its backward
    matches the 5-D path's gradient."""
    from trcnn.ops.roi_pool_pallas import flat_lane_groups, unflatten_pooled

    # C=512 exercises ncb > 1 at the default 4 MB table budget
    feat, rois = _fixture(3, C=512, R=8)
    B, H, W, C = feat.shape
    R = rois.shape[1]
    std = np.asarray(roi_max_pool_pallas(
        jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, True))
    flat = roi_max_pool_pallas(
        jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, True, True)
    assert flat.shape == (B * R, 7 * 7 * C)
    groups = flat_lane_groups(H, W, C, 7, 4)
    assert groups[0] > 1
    back = np.asarray(unflatten_pooled(flat, B, R, 7, C, groups))
    np.testing.assert_allclose(back, std, atol=0)

    g5 = np.random.RandomState(4).randn(B, R, 7, 7, C).astype(np.float32)
    # flatten g into the kernel's lane order to feed the flat backward
    ncb, cb = groups
    gf = np.moveaxis(g5.reshape(B, R, 49, ncb, cb), 3, 2).reshape(
        B * R, 49 * C)
    d_flat = jax.vjp(
        lambda f: roi_max_pool_pallas(f, jnp.asarray(rois), 7, 1 / 16.0,
                                      True, True),
        jnp.asarray(feat))[1](jnp.asarray(gf))[0]
    d_std = jax.vjp(
        lambda f: roi_max_pool_pallas(f, jnp.asarray(rois), 7, 1 / 16.0,
                                      True),
        jnp.asarray(feat))[1](jnp.asarray(g5))[0]
    np.testing.assert_allclose(np.asarray(d_flat), np.asarray(d_std),
                               atol=1e-5)


def test_bwd_channel_block_fits_r101_portrait():
    """The backward sizes its own channel block with a sublane-padded
    VMEM-stack model: at the forward's 256-lane block the R101-C4
    PORTRAIT train step (64x38 map, C=1024, pool 14) overflowed Mosaic's
    16 MB scoped VMEM by 80 KB while the kernel still took pooled as an
    input — observed as a train-step compile failure in the round-5
    learning re-run.  With binmax recomputed in-kernel (pooled block
    gone) BOTH R101 orientations keep 256 lanes (compile-verified on
    chip); COCO f32 stays not-fitting (XLA fallback, mirroring the
    forward's pallas_vmem_fits gate)."""
    from trcnn.ops.roi_pool_pallas import _bwd_channel_block

    assert _bwd_channel_block(64, 38, 1024, 3, 2, 14, 8) == (256, True)
    assert _bwd_channel_block(38, 64, 1024, 3, 2, 14, 8) == (256, True)
    assert _bwd_channel_block(38, 64, 512, 3, 2, 7, 8) == (256, True)
    assert _bwd_channel_block(38, 64, 512, 3, 4, 7, 8) == (128, True)
    assert _bwd_channel_block(50, 84, 512, 4, 2, 7, 8) == (128, True)
    assert _bwd_channel_block(50, 84, 512, 4, 4, 7, 8)[1] is False


def test_backward_oracle_pool14_interpret():
    """out_size=14 (the R101-C4 head's pool) through the Pallas backward
    vs the numpy oracle — the shape family the VMEM regression hit."""
    feat, rois = _fixture(7, B=1, H=22, W=18, C=8, R=8)
    feat[:, 3:9, 2:12, :] = 4.0  # plateau ties
    g = np.random.RandomState(8).randn(1, 8, 14, 14, 8).astype(np.float32)
    d_pal = np.asarray(jax.vjp(
        lambda f: roi_max_pool_pallas(f, jnp.asarray(rois), 14, 1 / 16.0,
                                      True),
        jnp.asarray(feat))[1](jnp.asarray(g))[0])
    want = roi_pool_backward_oracle_numpy(feat[0], rois[0], g[0],
                                          out_size=14)
    np.testing.assert_allclose(d_pal[0], want, atol=1e-4)


def test_pallas_vmem_fits_routes_coco_f32_to_xla():
    """Scoped-VMEM fit predicate (the COCO-config f32 train step compiled
    to a 17.67M > 16M stack allocation before the model gated on this —
    round-4 verify finding).  bf16 keeps the kernel on every supported
    canvas; only f32 at the COCO 800x1344 map falls back."""
    from trcnn.ops.roi_pool_pallas import pallas_vmem_fits

    # COCO 800x1344 canvas -> 50x84 stride-16 map, 512 channels
    assert not pallas_vmem_fits(50, 84, 512, 4)   # f32: overflow -> XLA
    assert pallas_vmem_fits(50, 84, 512, 2)       # bf16: fits
    # VGG 608x1024 canvas (38x64) fits in BOTH dtypes (f32 was the r1-r3
    # benched configuration; this pins that the gate does not regress it)
    assert pallas_vmem_fits(38, 64, 512, 4)
    assert pallas_vmem_fits(38, 64, 512, 2)
    # portrait VGG canvas (64x38, 4-level table) stays on the kernel too
    assert pallas_vmem_fits(64, 38, 512, 4)
    # R101 C4: 1024 channels, same map -> channel-blocked, fits
    assert pallas_vmem_fits(38, 64, 1024, 2)
