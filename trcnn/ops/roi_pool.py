"""RoI max pooling (exact Caffe/Chainer ``roi_pooling_2d`` semantics).

The reference uses Chainer's built-in ``F.roi_pooling_2d`` whose GPU path is
a raw CUDA kernel (SURVEY.md §3.3).  This is the portable XLA formulation:
each of the ``out x out`` bins gathers a static (MAX_BIN_H x MAX_BIN_W)
window of feature cells (the maximum bin extent for the given feature-map
size), masks cells past the bin end, and reduces with max.  All shapes are
static; JAX autodiff of (gather -> masked max) yields exactly the
argmax-scatter backward of the CUDA kernel.

Bin-boundary math matches the Caffe ROIPooling lineage:
  roi_start = round(coord * spatial_scale)        (round half away from zero)
  roi_size  = max(roi_end - roi_start + 1, 1)     (+1 pixel convention)
  bin [p]   = [floor(p * roi_size/out), ceil((p+1) * roi_size/out))
  empty bins output 0.

Backward contract (single-winner argmax scatter): each non-empty bin
routes its WHOLE upstream gradient to exactly ONE argmax cell per channel
— the reference's saved-argmax backward (Chainer ``roi_pooling_2d`` /
Caffe ROIPoolBackward scatter grads via the argmax recorded in forward;
SURVEY.md §3.3, §4.2).  Winner among exact-value ties (real at ReLU
zeros): the argmax cell minimizing the column-major key ``x*H + y`` —
i.e. first maximal column, then first maximal row within it.  (Caffe's
CUDA kernel keeps the row-major-first cell instead; both rules route the
full gradient to a single argmax cell and agree whenever the bin max is
unique, which is the numerically meaningful contract.  Column-major is
what the TPU kernel's rows-then-columns two-stage reduction yields
natively.)  Through round 4 the backward used the even tie-SPLIT of the
XLA ``reduce_max`` VJP; VERDICT r4 re-pinned the contract to the
reference's saved-argmax semantics.

A VMEM-resident Pallas kernel for the TPU hot path lives in
trcnn/ops/roi_pool_pallas.py; this module is the spec and the CPU-safe
fallback (BASELINE.json config 1 requires a CPU-runnable single-image path).
"""

from __future__ import annotations

import functools
from functools import lru_cache
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp

_NEG_INF = np.float32(-np.inf)


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """C round(): half away from zero (numpy/jnp round is half-to-even)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


# static size of the IEEE-f32 division table: roi_h/roi_w after rounding
# never exceeds the scaled image extent (<= 4096 feature cells covers any
# realistic resolution)
_DIV_TABLE_MAX = 4096


@lru_cache(maxsize=None)
def _f32_div_table_np(out_size: int):
    import numpy as np

    return (np.arange(_DIV_TABLE_MAX, dtype=np.float32) /
            np.float32(out_size))


def roi_bin_bounds(
    rois: jnp.ndarray, spatial_scale: float, out_size: int, feat_h: int, feat_w: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Integer bin boundaries for each roi and output bin.

    Returns (hstart, hend, wstart, wend), each (R, out) int32, clipped to the
    feature extent. ``hend``/``wend`` are exclusive.

    Bin arithmetic follows the Caffe/Chainer *GPU kernel* exactly: the bin
    size is the IEEE-float32 quotient ``roi_h / out_size`` and boundaries
    are floor/ceil of float32 products.  The f32 rounding error of the
    quotient decides ceil() at exact-multiple boundaries (e.g. roi_h=29,
    out=7: fl(29/7)*7 = 29.0000002 → ceil 30, not 29), so exact integer
    math would deviate per-box from the reference.  XLA's own f32 division
    (reciprocal multiply on TPU) is not correctly rounded either, so the
    quotient comes from a host-computed IEEE table indexed by roi size;
    the products are plain f32 multiplies (exact on TPU).
    """
    start_w = _round_half_away(rois[:, 0] * spatial_scale).astype(jnp.int32)
    start_h = _round_half_away(rois[:, 1] * spatial_scale).astype(jnp.int32)
    end_w = _round_half_away(rois[:, 2] * spatial_scale).astype(jnp.int32)
    end_h = _round_half_away(rois[:, 3] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(end_w - start_w + 1, 1)
    roi_h = jnp.maximum(end_h - start_h + 1, 1)

    table = jnp.asarray(_f32_div_table_np(out_size))
    bin_h = jnp.take(table, jnp.clip(roi_h, 0, _DIV_TABLE_MAX - 1))  # (R,)
    bin_w = jnp.take(table, jnp.clip(roi_w, 0, _DIV_TABLE_MAX - 1))

    p = jnp.arange(out_size, dtype=jnp.float32)
    hstart = jnp.floor(p[None, :] * bin_h[:, None]).astype(jnp.int32) + start_h[:, None]
    hend = jnp.ceil((p[None, :] + 1.0) * bin_h[:, None]).astype(jnp.int32) + start_h[:, None]
    wstart = jnp.floor(p[None, :] * bin_w[:, None]).astype(jnp.int32) + start_w[:, None]
    wend = jnp.ceil((p[None, :] + 1.0) * bin_w[:, None]).astype(jnp.int32) + start_w[:, None]

    hstart = jnp.clip(hstart, 0, feat_h)
    hend = jnp.clip(hend, 0, feat_h)
    wstart = jnp.clip(wstart, 0, feat_w)
    wend = jnp.clip(wend, 0, feat_w)
    return hstart, hend, wstart, wend


def max_bin_extent(feat_dim: int, out_size: int) -> int:
    """Static upper bound on a bin's cell count along one axis.

    bin_size <= feat_dim / out_size, and a [floor, ceil) window spans at most
    ceil(bin_size) + 1 cells.
    """
    return int(-(-feat_dim // out_size)) + 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _roi_max_pool_cv(feat, rois, out_size, spatial_scale):
    return _roi_max_pool_impl(feat, rois, out_size, spatial_scale)


@functools.partial(jax.jit, static_argnames=("out_size", "spatial_scale"))
def roi_max_pool(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """RoI max pooling over one image.

    Args:
      feat: (H, W, C) feature map (NHWC single image).
      rois: (R, 4) boxes in *image* coordinates (x1, y1, x2, y2).
      out_size: pooled output resolution (7 for the VGG-16 head).
      spatial_scale: feature stride inverse (1/16).

    Returns:
      (R, out_size, out_size, C) pooled features.  Empty bins are 0, matching
      the Caffe kernel.  Invalid/padding rois simply produce values that the
      caller masks downstream.

    Backward: single-winner argmax scatter (module docstring) via a custom
    VJP — every backend and formulation shares the one contract.
    """
    return _roi_max_pool_cv(feat, rois, out_size, spatial_scale)


def _roi_max_pool_impl(feat, rois, out_size, spatial_scale):
    h, w, c = feat.shape
    r = rois.shape[0]
    hstart, hend, wstart, wend = roi_bin_bounds(rois, spatial_scale, out_size, h, w)

    mbh = max_bin_extent(h, out_size)
    mbw = max_bin_extent(w, out_size)
    flat = feat.reshape(h * w, c)

    dh = jnp.arange(mbh, dtype=jnp.int32)
    dw = jnp.arange(mbw, dtype=jnp.int32)

    cols = []
    for ph in range(out_size):
        rows = []
        h_idx = hstart[:, ph, None] + dh[None, :]          # (R, MBH)
        h_ok = h_idx < hend[:, ph, None]
        h_idx = jnp.clip(h_idx, 0, h - 1)
        for pw in range(out_size):
            w_idx = wstart[:, pw, None] + dw[None, :]      # (R, MBW)
            w_ok = w_idx < wend[:, pw, None]
            w_idx = jnp.clip(w_idx, 0, w - 1)
            lin = h_idx[:, :, None] * w + w_idx[:, None, :]  # (R, MBH, MBW)
            vals = flat[lin.reshape(r, -1)]                 # (R, MBH*MBW, C)
            ok = (h_ok[:, :, None] & w_ok[:, None, :]).reshape(r, -1)
            vals = jnp.where(ok[..., None], vals, _NEG_INF)
            binmax = jnp.max(vals, axis=1)                  # (R, C)
            empty = ~jnp.any(ok, axis=1)
            rows.append(jnp.where(empty[:, None], 0.0, binmax))
        cols.append(jnp.stack(rows, axis=1))                # (R, out, C)
    return jnp.stack(cols, axis=1)                          # (R, out, out, C)


def roi_pool_backward_xla(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    g: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """Single-winner argmax-scatter backward, portable XLA formulation.

    feat (H, W, C), rois (R, 4), g (R, out, out, C) → dfeat (H, W, C).
    Winner = the argmax cell of each bin minimizing the column-major key
    ``x*H + y`` (module docstring).  Serves as the custom VJP of
    ``roi_max_pool`` (CPU path, and the f32-COCO canvas where the Pallas
    kernel's table block overflows scoped VMEM).
    """
    h, w, c = feat.shape
    r = rois.shape[0]
    hstart, hend, wstart, wend = roi_bin_bounds(
        rois, spatial_scale, out_size, h, w)
    mbh = max_bin_extent(h, out_size)
    mbw = max_bin_extent(w, out_size)
    flat = feat.reshape(h * w, c).astype(jnp.float32)
    dh = jnp.arange(mbh, dtype=jnp.int32)
    dw = jnp.arange(mbw, dtype=jnp.int32)
    big = jnp.int32(h * w + 1)

    dflat = jnp.zeros((h * w, c), jnp.float32)
    for ph in range(out_size):
        h_idx = hstart[:, ph, None] + dh[None, :]            # (R, MBH)
        h_ok = h_idx < hend[:, ph, None]
        h_idx = jnp.clip(h_idx, 0, h - 1)
        for pw in range(out_size):
            w_idx = wstart[:, pw, None] + dw[None, :]        # (R, MBW)
            w_ok = w_idx < wend[:, pw, None]
            w_idx = jnp.clip(w_idx, 0, w - 1)
            lin = h_idx[:, :, None] * w + w_idx[:, None, :]  # (R, MBH, MBW)
            vals = flat[lin.reshape(r, -1)]                  # (R, M, C)
            ok = (h_ok[:, :, None] & w_ok[:, None, :]).reshape(r, -1)
            vals = jnp.where(ok[..., None], vals, _NEG_INF)
            binmax = jnp.max(vals, axis=1, keepdims=True)    # (R, 1, C)
            key = (w_idx[:, None, :] * h
                   + h_idx[:, :, None]).reshape(r, -1)       # column-major
            hit = ok[..., None] & (vals == binmax)
            keyc = jnp.where(hit, key[..., None], big)       # (R, M, C)
            kmin = jnp.min(keyc, axis=1, keepdims=True)
            # hit guard: empty bins have kmin == big everywhere
            winner = (keyc == kmin) & hit
            contrib = jnp.where(winner,
                                g[:, ph, pw, :].astype(jnp.float32)[:, None],
                                0.0)
            dflat = dflat.at[lin.reshape(-1)].add(
                contrib.reshape(-1, c), mode="drop")
    return dflat.reshape(h, w, c).astype(feat.dtype)


def _roi_max_pool_fwd(feat, rois, out_size, spatial_scale):
    return _roi_max_pool_impl(feat, rois, out_size, spatial_scale), (feat,
                                                                     rois)


def _roi_max_pool_bwd(out_size, spatial_scale, res, g):
    feat, rois = res
    dfeat = roi_pool_backward_xla(feat, rois, g, out_size, spatial_scale)
    return dfeat, jnp.zeros_like(rois)


_roi_max_pool_cv.defvjp(_roi_max_pool_fwd, _roi_max_pool_bwd)


def roi_max_pool_batched(feat: jnp.ndarray, rois: jnp.ndarray,
                         out_size: int = 7, spatial_scale: float = 1.0 / 16.0):
    """vmap over a leading batch axis of both feat (B,H,W,C) and rois (B,R,4)."""
    fn = functools.partial(roi_max_pool, out_size=out_size, spatial_scale=spatial_scale)
    return jax.vmap(fn)(feat, rois)


def roi_max_pool_oracle_numpy(feat, rois, out_size=7, spatial_scale=1.0 / 16.0):
    """Literal-loop numpy oracle of the Caffe ROIPooling forward (test use).

    Bin arithmetic in IEEE float32 — the reference GPU kernel computes
    ``bin_size = roi_h / pooled_h`` in f32, and the quotient's rounding
    error decides ceil() at exact-multiple boundaries (see
    ``roi_bin_bounds``).  (Chainer's *CPU* path does this math in float64,
    which differs at those same boundaries; the GPU kernel is the
    reference's production path and the contract here.)
    """
    import math
    import numpy as np

    feat = np.asarray(feat)
    rois = np.asarray(rois, dtype=np.float64)
    h, w, c = feat.shape
    r = rois.shape[0]
    out = np.zeros((r, out_size, out_size, c), dtype=feat.dtype)

    def rnd(x):
        return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)

    f32 = np.float32
    for i in range(r):
        sw, sh = rnd(rois[i, 0] * spatial_scale), rnd(rois[i, 1] * spatial_scale)
        ew, eh = rnd(rois[i, 2] * spatial_scale), rnd(rois[i, 3] * spatial_scale)
        rw = max(ew - sw + 1, 1)
        rh = max(eh - sh + 1, 1)
        bw = f32(rw) / f32(out_size)
        bh = f32(rh) / f32(out_size)
        for ph in range(out_size):
            for pw in range(out_size):
                hs = min(max(int(math.floor(f32(ph) * bh)) + sh, 0), h)
                he = min(max(int(math.ceil(f32(ph + 1) * bh)) + sh, 0), h)
                ws = min(max(int(math.floor(f32(pw) * bw)) + sw, 0), w)
                we = min(max(int(math.ceil(f32(pw + 1) * bw)) + sw, 0), w)
                if he <= hs or we <= ws:
                    continue
                out[i, ph, pw] = feat[hs:he, ws:we].reshape(-1, c).max(axis=0)
    return out


def roi_pool_backward_oracle_numpy(feat, rois, g, out_size=7,
                                   spatial_scale=1.0 / 16.0):
    """Literal-loop numpy oracle of the single-winner argmax-scatter
    backward (test use).  Same bin arithmetic as the forward oracle; each
    non-empty bin routes g[bin, c] entirely to the argmax cell minimizing
    the column-major key x*H + y (module docstring)."""
    import math

    feat = np.asarray(feat, dtype=np.float32)
    rois = np.asarray(rois, dtype=np.float64)
    g = np.asarray(g, dtype=np.float32)
    h, w, c = feat.shape
    r = rois.shape[0]
    dfeat = np.zeros((h, w, c), dtype=np.float32)

    def rnd(x):
        return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)

    f32 = np.float32
    for i in range(r):
        sw, sh = rnd(rois[i, 0] * spatial_scale), rnd(rois[i, 1] * spatial_scale)
        ew, eh = rnd(rois[i, 2] * spatial_scale), rnd(rois[i, 3] * spatial_scale)
        rw = max(ew - sw + 1, 1)
        rh = max(eh - sh + 1, 1)
        bw = f32(rw) / f32(out_size)
        bh = f32(rh) / f32(out_size)
        for ph in range(out_size):
            for pw in range(out_size):
                hs = min(max(int(math.floor(f32(ph) * bh)) + sh, 0), h)
                he = min(max(int(math.ceil(f32(ph + 1) * bh)) + sh, 0), h)
                ws = min(max(int(math.floor(f32(pw) * bw)) + sw, 0), w)
                we = min(max(int(math.ceil(f32(pw + 1) * bw)) + sw, 0), w)
                if he <= hs or we <= ws:
                    continue
                window = feat[hs:he, ws:we]                  # (bh, bw, C)
                binmax = window.reshape(-1, c).max(axis=0)
                for ch in range(c):
                    best = None
                    for x in range(ws, we):                  # columns first
                        for y in range(hs, he):
                            if feat[y, x, ch] == binmax[ch]:
                                best = (y, x)
                                break
                        if best is not None:
                            break
                    dfeat[best[0], best[1], ch] += g[i, ph, pw, ch]
    return dfeat
