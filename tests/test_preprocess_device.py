"""Device-side preprocessing vs the host cv2 path (north-star requirement:
preprocessing as device-side JAX transforms).

The two resizers share the half-pixel bilinear convention; they differ
only at the scaled image's right/bottom border (cv2 clamps, the XLA
kernel sees zeros) — the comparison masks a 2px border.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trcnn.config import ImageConfig
from trcnn.data.preprocess import preprocess_device, preprocess_image


def test_device_preprocess_matches_host_interior():
    cfg = ImageConfig(target_min_size=60, target_max_size=100,
                      pad_h=64, pad_w=112)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(45, 80, 3)).astype(np.uint8)

    host_canvas, host_info = preprocess_image(img, cfg)

    raw = np.zeros((64, 96, 3), np.uint8)
    raw[:45, :80] = img
    scale = float(host_info[2])
    dev_canvas, dev_info = jax.jit(
        lambda r, h, w, s: preprocess_device(r, h, w, s, cfg)
    )(jnp.asarray(raw), 45, 80, scale)
    dev_canvas = np.asarray(dev_canvas)

    np.testing.assert_allclose(np.asarray(dev_info), host_info, rtol=1e-5)
    sh, sw = int(host_info[0]), int(host_info[1])
    # interior parity (borders differ by edge-handling)
    a = host_canvas[: sh - 2, : sw - 2]
    b = dev_canvas[: sh - 2, : sw - 2]
    np.testing.assert_allclose(a, b, atol=1.5)  # sub-pixel resampler diffs
    # padding exactly zero on both
    assert (dev_canvas[sh:] == 0).all() and (dev_canvas[:, sw:] == 0).all()


def test_device_preprocess_masks_raw_padding():
    """Garbage beyond the raw extent must not leak into the canvas."""
    cfg = ImageConfig(target_min_size=32, target_max_size=64,
                      pad_h=32, pad_w=64)
    raw = np.full((40, 70, 3), 255, np.uint8)  # garbage everywhere
    raw[:20, :40] = 10                          # the real image
    scale = 32.0 / 20.0
    canvas, info = jax.jit(
        lambda r: preprocess_device(r, 20, 40, scale, cfg))(jnp.asarray(raw))
    canvas = np.asarray(canvas)
    sh, sw = int(info[0]), int(info[1])
    means = np.asarray(cfg.pixel_means_bgr, np.float32)
    # interior must reflect value 10, not the 255 garbage
    interior = canvas[: sh - 2, : sw - 2] + means
    assert abs(interior.mean() - 10.0) < 1.0
