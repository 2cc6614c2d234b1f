"""Parity tests for the fused Pallas stem kernel (interpret mode — CI runs
on CPU; on-chip parity is probed by the verify harness).

The kernel must match the lax.conv reference (= the XLA/flax path of
trcnn/models/vgg16.py) up to f32-accumulation ordering inside the 3x3
window: in f32 that's ~1e-5 relative, and the halo/packing logic (the part
that could be *wrong* rather than reordered) is exercised by edge-heavy
shapes and an impulse test that must be exact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trcnn.ops.stem_pallas import (fused_stem_block1, stem_block1_reference)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("h,w,r_pool", [(16, 12, 4), (24, 64, 4), (8, 10, 2)])
def test_fused_stem_matches_reference(h, w, r_pool):
    rng = np.random.default_rng(0)
    b, cin, c = 2, 3, 64
    x = jnp.asarray(_rand(rng, b, h, w, cin))
    w1 = jnp.asarray(_rand(rng, 3, 3, cin, c) * 0.1)
    b1 = jnp.asarray(_rand(rng, c) * 0.1)
    w2 = jnp.asarray(_rand(rng, 3, 3, c, c) * 0.05)
    b2 = jnp.asarray(_rand(rng, c) * 0.1)

    want = np.asarray(stem_block1_reference(x, w1, b1, w2, b2))
    got = np.asarray(fused_stem_block1(x, w1, b1, w2, b2, r_pool=r_pool,
                                       interpret=True))
    assert got.shape == (b, h // 2, w // 2, c)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_stem_impulse_exact():
    """A one-hot input exercises every tap path without accumulation-order
    ambiguity (single nonzero product per output) — must match EXACTLY,
    including at the SAME-padding halo and tile boundaries."""
    b, h, w, cin, c = 1, 16, 12, 3, 64
    for (iy, ix) in [(0, 0), (0, 11), (15, 0), (7, 5), (8, 6), (3, 4)]:
        x = np.zeros((b, h, w, cin), np.float32)
        x[0, iy, ix, 1] = 1.0
        w1 = np.zeros((3, 3, cin, c), np.float32)
        w1[:, :, 1, :] = np.arange(9, dtype=np.float32).reshape(3, 3, 1)
        b1 = np.zeros(c, np.float32)
        w2 = np.full((3, 3, c, c), 1.0 / (9 * c), np.float32)
        b2 = np.zeros(c, np.float32)
        args = map(jnp.asarray, (x, w1, b1, w2, b2))
        xj, w1j, b1j, w2j, b2j = args
        want = np.asarray(stem_block1_reference(xj, w1j, b1j, w2j, b2j))
        got = np.asarray(fused_stem_block1(xj, w1j, b1j, w2j, b2j,
                                           r_pool=4, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"impulse at {(iy, ix)}")


def test_fused_stem_bf16():
    rng = np.random.default_rng(1)
    b, h, w, cin, c = 1, 16, 16, 3, 64
    x = jnp.asarray(_rand(rng, b, h, w, cin)).astype(jnp.bfloat16)
    w1 = jnp.asarray(_rand(rng, 3, 3, cin, c) * 0.1)
    b1 = jnp.asarray(_rand(rng, c) * 0.1)
    w2 = jnp.asarray(_rand(rng, 3, 3, c, c) * 0.05)
    b2 = jnp.asarray(_rand(rng, c) * 0.1)
    want = np.asarray(stem_block1_reference(x, w1, b1, w2, b2)
                      ).astype(np.float32)
    got = np.asarray(fused_stem_block1(x, w1, b1, w2, b2, r_pool=4,
                                       interpret=True)).astype(np.float32)
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / scale) < 0.03  # bf16 rounding
