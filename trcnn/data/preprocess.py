"""Image preprocessing (SURVEY.md §8 "Preprocess").

Reference semantics (``R:forward.py`` preprocessing, SURVEY.md §3.4): BGR
channel order, subtract Caffe pixel means (102.9801, 115.9465, 122.7717),
scale so the shorter side is 600 capped so the longer side ≤ 1000, single
scale.  The TPU rebuild adds the static padded canvas: every image lands in
a fixed (pad_h, pad_w) zero-padded buffer so batch shapes never change.

Two paths:
  * ``preprocess_image`` — host numpy/cv2; exact cv2.resize bilinear parity
    with the reference; used by the data loader.
  * ``preprocess_device`` — jittable ``jax.image.scale_and_translate`` on a
    static raw buffer; keeps the host out of the hot loop (the north-star
    requirement in BASELINE.json) for serving-style pipelines.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from trcnn.config import ImageConfig


def compute_scale(h: int, w: int, cfg: ImageConfig = ImageConfig(),
                  min_size: Optional[int] = None) -> float:
    """600/1000 rule: scale shorter side to target_min_size, capped so the
    longer side does not exceed target_max_size.  ``min_size`` overrides
    the target (multi-scale training samples it per image)."""
    short, long = min(h, w), max(h, w)
    target = min_size if min_size is not None else cfg.target_min_size
    scale = target / float(short)
    if round(scale * long) > cfg.target_max_size:
        scale = cfg.target_max_size / float(long)
    return scale


def canvas_shape(h: int, w: int, cfg: ImageConfig = ImageConfig()) -> Tuple[int, int]:
    """The static canvas bucket for an image: (pad_h, pad_w) for landscape,
    transposed for portrait (SURVEY.md §6.7 bucketed-resolution design —
    each bucket is one compiled graph)."""
    return (cfg.pad_h, cfg.pad_w) if w >= h else (cfg.pad_w, cfg.pad_h)


def preprocess_image(
    img_bgr: np.ndarray, cfg: ImageConfig = ImageConfig(), flip: bool = False,
    min_size: Optional[int] = None, as_uint8: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side preprocessing of one BGR uint8 image.

    Returns (canvas, im_info): canvas (ph, pw, 3) — the orientation bucket
    of ``canvas_shape`` — with the scaled image in the top-left corner and
    zeros elsewhere; im_info = (scaled_h, scaled_w, scale) float32.

    ``as_uint8``: emit the canvas as uint8 WITHOUT mean subtraction (the
    model subtracts on device, see ``FasterRCNN`` uint8 input handling) —
    quarters the host→device bytes at ≤0.5-intensity rounding cost.
    Default float32 mean-subtracted (bit-parity with the reference's
    preprocessing).
    """
    import cv2

    h, w = img_bgr.shape[:2]
    scale = compute_scale(h, w, cfg, min_size=min_size)
    sw, sh = int(round(w * scale)), int(round(h * scale))
    pad_h, pad_w = canvas_shape(h, w, cfg)
    if sh > pad_h or sw > pad_w:
        raise ValueError(
            f"scaled image {sh}x{sw} exceeds canvas {pad_h}x{pad_w}")
    img = img_bgr
    if flip:
        img = img[:, ::-1]
    resized = cv2.resize(img.astype(np.float32), (sw, sh),
                         interpolation=cv2.INTER_LINEAR)
    info = np.asarray([sh, sw, scale], dtype=np.float32)
    if as_uint8:
        canvas = np.zeros((pad_h, pad_w, 3), dtype=np.uint8)
        canvas[:sh, :sw] = np.clip(np.rint(resized), 0, 255).astype(np.uint8)
        return canvas, info
    resized -= np.asarray(cfg.pixel_means_bgr, dtype=np.float32)
    canvas = np.zeros((pad_h, pad_w, 3), dtype=np.float32)
    canvas[:sh, :sw] = resized
    return canvas, info


def scale_gt_boxes(boxes: np.ndarray, scale: float, orig_w: int,
                   flip: bool = False) -> np.ndarray:
    """Scale (and optionally horizontally flip) gt boxes to canvas coords.

    Flip uses the +1 convention mirror: x' = W - 1 - x (upstream
    py-faster-rcnn flip_boxes lineage), applied *before* scaling.
    """
    boxes = np.asarray(boxes, dtype=np.float32).copy()
    if flip and boxes.size:
        x1 = boxes[:, 0].copy()
        boxes[:, 0] = orig_w - 1.0 - boxes[:, 2]
        boxes[:, 2] = orig_w - 1.0 - x1
    return boxes * scale


def preprocess_device(raw_u8, raw_h, raw_w, scale,
                      cfg: ImageConfig = ImageConfig()):
    """Jittable preprocessing: raw uint8 buffer → mean-subtracted canvas.

    Args:
      raw_u8: (RAW_H, RAW_W, 3) uint8 BGR, image in the top-left corner
              (static raw buffer; contents beyond raw_h/raw_w are ignored).
      raw_h, raw_w: traced valid extent of the raw image.
      scale: traced resize factor (host computes it via ``compute_scale``).

    Returns (canvas (pad_h, pad_w, 3) float32, im_info (3,)).

    Bilinear `scale_and_translate` with half-pixel centers reproduces
    cv2.INTER_LINEAR up to edge-handling: cv2 clamps at borders while the
    XLA kernel treats outside as zero, so the last scaled row/column can
    differ; detection outputs are insensitive to this (goldens use the host
    path).
    """
    import jax
    import jax.numpy as jnp

    x = raw_u8.astype(jnp.float32)
    # zero out the area beyond the valid raw extent so it cannot bleed in
    yy = jnp.arange(x.shape[0])[:, None, None]
    xx = jnp.arange(x.shape[1])[None, :, None]
    x = jnp.where((yy < raw_h) & (xx < raw_w), x, 0.0)

    s = jnp.asarray(scale, jnp.float32)
    sh = jnp.round(raw_h * s)
    sw = jnp.round(raw_w * s)
    # cv2.resize targets the ROUNDED size, so the effective per-axis scale
    # is sh/h (not s); translation 0 — scale_and_translate's kernel
    # already applies the half-pixel-center convention
    # (jax.image.resize passes exactly this), matching cv2.INTER_LINEAR.
    scales = jnp.stack([sh / raw_h, sw / raw_w]).astype(jnp.float32)
    trans = jnp.zeros((2,), jnp.float32)
    canvas = jax.image.scale_and_translate(
        x, (cfg.pad_h, cfg.pad_w, 3), (0, 1), scales, trans,
        method="linear", antialias=False)
    yy2 = jnp.arange(cfg.pad_h)[:, None, None]
    xx2 = jnp.arange(cfg.pad_w)[None, :, None]
    inside = (yy2 < sh) & (xx2 < sw)
    means = jnp.asarray(cfg.pixel_means_bgr, jnp.float32)
    canvas = jnp.where(inside, canvas - means, 0.0)
    im_info = jnp.stack([sh, sw, s]).astype(jnp.float32)
    return canvas, im_info
