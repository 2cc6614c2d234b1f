"""RoIAlign (bilinear, average) — the modern alternative to RoI max pooling.

Not present in the reference (which predates Mask R-CNN), but offered as a
config switch (``RoIConfig.mode="align"``) because it is the standard choice
for new training runs and is strictly friendlier to TPU (fixed sampling
pattern, no data-dependent bin extents).

Semantics follow the Mask R-CNN / torchvision convention with
``aligned=False`` (no half-pixel shift, continuous coordinates, no +1):
  bin size = roi_size / out, sampling_ratio x sampling_ratio bilinear
  samples per bin, averaged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("out_size", "spatial_scale", "sampling_ratio")
)
def roi_align(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign over one image.

    Args:
      feat: (H, W, C) feature map.
      rois: (R, 4) boxes in image coordinates.
    Returns:
      (R, out_size, out_size, C).
    """
    h, w, c = feat.shape
    r = rois.shape[0]
    s = sampling_ratio

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    # sample grid: for bin p, samples at p*bin + (j+0.5)*bin/s, j in [0, s)
    grid = (jnp.arange(out_size * s, dtype=jnp.float32) + 0.5) / s  # (out*s,)
    sy = y1[:, None] + grid[None, :] * bin_h[:, None]  # (R, out*s)
    sx = x1[:, None] + grid[None, :] * bin_w[:, None]

    def bilinear_axis(coord, size):
        coord = jnp.clip(coord, 0.0, size - 1.0)
        lo = jnp.floor(coord)
        frac = coord - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        return lo, hi, frac

    y_lo, y_hi, fy = bilinear_axis(sy, h)
    x_lo, x_hi, fx = bilinear_axis(sx, w)

    flat = feat.reshape(h * w, c)

    def gather(hy, hx):  # (R, out*s) x (R, out*s) -> (R, out*s, out*s, C)
        lin = hy[:, :, None] * w + hx[:, None, :]
        return flat[lin.reshape(r, -1)].reshape(r, out_size * s, out_size * s, c)

    v00 = gather(y_lo, x_lo)
    v01 = gather(y_lo, x_hi)
    v10 = gather(y_hi, x_lo)
    v11 = gather(y_hi, x_hi)
    wy = fy[:, :, None, None]
    wx = fx[:, None, :, None]
    vals = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )  # (R, out*s, out*s, C)
    # average the s x s samples of each bin
    vals = vals.reshape(r, out_size, s, out_size, s, c)
    return vals.mean(axis=(2, 4))


def roi_align_batched(feat, rois, out_size=7, spatial_scale=1.0 / 16.0,
                      sampling_ratio=2):
    fn = functools.partial(
        roi_align, out_size=out_size, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio,
    )
    return jax.vmap(fn)(feat, rois)
