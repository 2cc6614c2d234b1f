"""Fixed-shape greedy NMS for TPU.

TPU-native replacement for the reference's ``cpu_nms.pyx`` / ``gpu_nms.pyx``
+ ``nms_kernel.cu`` (SURVEY.md §3.3).  The CUDA kernel's 64-box bitmask-tile
structure is re-thought for XLA/VPU:

  1. sort boxes by score (descending, ties to the lower index — matching the
     reference's stable argsort);
  2. resolve the first tile of T boxes with the greedy-recurrence fixpoint
         keep[c] = valid[c] & !any_{r<c}(keep[r] & iou[r,c] > t)
     (Jacobi iteration over the T x T IoU matrix: on a suppression DAG this
     converges in chain-depth steps — typically 3-5 — and the fixpoint IS
     the greedy solution, checked by a while_loop, so the result stays
     *exact*);
  3. walk the remaining tiles in a while_loop that exits as soon as the
     finalized prefix holds ``max_out`` survivors (keep-flags of processed
     tiles are final — later boxes never suppress earlier ones); each tile
     first pulls cross-suppression from the kept prefix with one (T x N)
     IoU pass, then runs its own fixpoint.  In the common case (real RPN
     score distributions) tile 0 already yields ``max_out`` survivors and
     NO cross-tile IoU work happens at all;
  4. emit the first ``max_out`` surviving boxes as indices + validity mask.

This is *exactly* greedy NMS (bit-identical keep-set to the O(n^2) host
loop, verified against a numpy oracle in tests/test_nms.py), but the
sequential dependency is ~chain-depth matrix steps per tile instead of one
step per box — all the heavy IoU work is dense, batched, fixed-shape
vector math that XLA tiles onto the VPU.  Everything jits, vmaps (batch /
class axes), and runs unchanged on CPU.

A Pallas variant lives in trcnn/ops/nms_pallas.py; this module is the
portable XLA implementation and the numerical spec.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from trcnn.ops.boxes import box_overlap_gt

_NEG_INF = np.float32(-np.inf)


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, value) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("max_out", "tile", "presorted"))
def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh,
    max_out: int,
    tile: Optional[int] = None,
    presorted: bool = False,
    groups: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a padded box set.

    Args:
      boxes:  (N, 4) float boxes (x1, y1, x2, y2), +1 pixel convention.
      scores: (N,) float scores.
      valid:  (N,) bool; False entries are padding and never selected.
      iou_thresh: scalar IoU threshold (suppress if IoU > thresh).
      max_out: static output capacity K.
      tile: static tile size for the sequential-suppression window.
        Default (None): one tile covering all boxes when N ≤ 6144 — the
        whole suppression is a single fixpoint over the N x N IoU matrix
        (device-measured ~1 ms at N=6000) — else 4096-box tiles to bound
        the matrix memory (train-time N=12000 ⇒ 3 tiles).
      presorted: the caller guarantees boxes/valid are already score-sorted
        descending (invalid at the end) — e.g. straight out of
        ``masked_topk`` — so the internal full sort is skipped (the sort is
        ~1/3 of device time at the 12000-box train shape).
      groups: optional (N,) int32 group ids; suppression is restricted to
        same-group pairs (cross-group IoU treated as 0).  Used by the
        single-call multiclass fast path — grouped NMS over the flattened
        (class, roi) set is bit-identical to independent per-class NMS.

    Returns:
      keep_idx:   (K,) int32 indices into the *input* arrays, score-ordered.
                  Padding slots hold 0.
      keep_valid: (K,) bool validity of each output slot.
    """
    n_in = boxes.shape[0]
    if tile is None:
        # capacity-aware: the early exit fires once max_out survivors are
        # finalized, so the peeled tile should plausibly contain them —
        # size it to ~2x max_out (train-time max_out=2000 ⇒ 4096-tiles;
        # test-time 300 ⇒ 2048)
        padded = -(-n_in // 512) * 512
        want = max(2048, -(-2 * max_out // 512) * 512)
        tile = min(padded, want)
    # --- sort by score descending (stable: ties to lower index) ---------
    if presorted:
        order = jnp.arange(n_in, dtype=jnp.int32)
        sboxes = boxes
        svalid = valid
        sgroups = groups
    else:
        # boxes/groups/index ride the sort as payload operands: a stable
        # ascending sort on -score is tie-identical to lax.top_k, and the
        # carried payloads replace three row-gathers — TPU gathers of
        # small (N, 4) rows cost more than the extra sort operands
        # (multiclass 20x300 shape, device: 4.54 -> 3.44 ms/b32 for the
        # sort stage, keep-sets bit-identical)
        masked = jnp.where(valid, scores.astype(jnp.float32), _NEG_INF)
        ops = (-masked, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
               jnp.arange(n_in, dtype=jnp.int32))
        if groups is not None:
            ops = ops + (groups,)
        out = lax.sort(ops, dimension=-1, is_stable=True, num_keys=1)
        sorted_scores = -out[0]
        sboxes = jnp.stack(out[1:5], axis=-1)
        order = out[5]
        svalid = sorted_scores > _NEG_INF
        sgroups = out[6] if groups is not None else None

    # --- pad to a tile multiple -----------------------------------------
    sboxes = _pad_to_multiple(sboxes, tile, axis=0, value=0.0)
    svalid = _pad_to_multiple(svalid, tile, axis=0, value=False)
    if sgroups is not None:
        sgroups = _pad_to_multiple(sgroups, tile, axis=0, value=-1)
    n = sboxes.shape[0]
    num_tiles = n // tile

    suppressed0 = ~svalid
    pos = jnp.arange(n, dtype=jnp.int32)
    row_idx = jnp.arange(tile, dtype=jnp.int32)
    upper_mask = row_idx[:, None] < row_idx[None, :]  # r strictly before c

    def self_suppress(tb, valid_t, tg):
        """Greedy fixpoint over one tile's T x T matrix:
        keep[c] = valid[c] & !any_{r<c}(keep[r] & over[r,c]).  Jacobi
        iteration converges in suppression-chain depth (the while_loop
        tracks it exactly), and the fixpoint IS the greedy solution."""
        # division-free overlap predicate (box_overlap_gt docstring)
        upper = box_overlap_gt(tb, tb, iou_thresh) & upper_mask  # (T, T)
        if tg is not None:
            upper &= tg[:, None] == tg[None, :]

        def fix_cond(kk):
            k_old, k_new = kk
            return jnp.any(k_old != k_new)

        def fix_body(kk):
            _, k = kk
            return k, valid_t & ~jnp.any(upper & k[:, None], axis=0)

        k0 = valid_t
        k1 = valid_t & ~jnp.any(upper & k0[:, None], axis=0)
        _, keep_t = lax.while_loop(fix_cond, fix_body, (k0, k1))
        return keep_t

    # --- tile 0, peeled statically: no cross-suppression exists yet ------
    keep_t0 = self_suppress(sboxes[:tile], svalid[:tile],
                            None if sgroups is None else sgroups[:tile])
    suppressed0 = lax.dynamic_update_slice(suppressed0, ~keep_t0, (0,))

    if num_tiles > 1:
        # --- later tiles, processed lazily with early exit --------------
        # A processed tile's keep-flags are FINAL (later boxes never
        # suppress earlier ones), so the loop stops once the finalized
        # prefix holds max_out survivors — for real RPN score
        # distributions tile 0 almost always does, and then NO (T x N)
        # cross-IoU work happens at all.  Cross-suppression is pulled
        # per-tile from the kept prefix instead of pushed to the suffix.
        def tile_body(i, suppressed):
            start = i * tile
            tb = lax.dynamic_slice(sboxes, (start, 0), (tile, 4))
            sup_t = lax.dynamic_slice(suppressed, (start,), (tile,))
            tg = (None if sgroups is None
                  else lax.dynamic_slice(sgroups, (start,), (tile,)))

            kept_prefix = ~suppressed & (pos < start)            # (N,)
            over_tn = box_overlap_gt(tb, sboxes, iou_thresh)     # (T, N)
            if tg is not None:
                over_tn &= tg[:, None] == sgroups[None, :]
            killed = jnp.any(over_tn & kept_prefix[None, :], axis=1)
            keep_t = self_suppress(tb, ~(sup_t | killed), tg)
            return lax.dynamic_update_slice(suppressed, ~keep_t, (start,))

        # valid entries are score-sorted to the front, so once a tile is
        # all-padding every later tile is too — exit instead of burning
        # (T, N) IoU passes on padding (matters when few boxes clear the
        # score threshold, e.g. multiclass NMS at eval thresholds).
        tile_has_valid = jnp.any(svalid.reshape(num_tiles, tile), axis=1)

        def loop_cond(state):
            i, suppressed = state
            finalized_keep = ~suppressed & (pos < i * tile)
            return ((i < num_tiles)
                    & tile_has_valid[jnp.minimum(i, num_tiles - 1)]
                    & (jnp.sum(finalized_keep.astype(jnp.int32)) < max_out))

        def loop_body(state):
            i, suppressed = state
            return i + 1, tile_body(i, suppressed)

        _, suppressed = lax.while_loop(loop_cond, loop_body,
                                       (1, suppressed0))
    else:
        suppressed = suppressed0
    keep = ~suppressed  # still score-sorted

    # --- compact the first max_out kept boxes ---------------------------
    # kept boxes already appear in score order; selecting the smallest
    # positions among kept == selecting the top-scoring survivors.
    sel_key = jnp.where(keep, pos, n)
    neg_vals, sel_sorted_pos = lax.top_k(-sel_key, max_out)
    keep_valid = neg_vals > -n
    # sel_sorted_pos indexes into the sorted arrays -> map to input indices
    keep_idx = jnp.take(order, (-neg_vals).astype(jnp.int32) % n, axis=0)
    keep_idx = jnp.where(keep_valid, keep_idx, 0).astype(jnp.int32)
    return keep_idx, keep_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh,
    max_out: int,
    tile: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """nms_padded vmapped over one leading batch axis."""
    fn = functools.partial(nms_padded, max_out=max_out, tile=tile)
    return jax.vmap(fn, in_axes=(0, 0, 0, None))(boxes, scores, valid, iou_thresh)


@functools.partial(
    jax.jit,
    static_argnames=("max_per_class", "max_total", "tile", "class_offset",
                     "nms_impl"),
)
def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh,
    score_thresh,
    max_per_class: int,
    max_total: int,
    tile: Optional[int] = None,
    class_offset: int = 1,
    nms_impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Test-time per-class NMS + merge (the reference's forward.py epilogue,
    SURVEY.md §4.1), fully on device.

    Args:
      boxes:  (R, C, 4) class-specific decoded boxes (or (R, 4), shared).
      scores: (R, C) per-class probabilities INCLUDING background at col 0.
      valid:  (R,) RoI validity.
      iou_thresh: per-class NMS threshold (0.3 at test time).
      score_thresh: minimum score to consider a detection.
      max_per_class / max_total: static capacities.
      class_offset: first foreground class column (1 skips background).
      nms_impl: "xla" (the spec), "pallas" (grouped VMEM kernel), or
        "auto" (Pallas on TPU).  Applies to the single-call fast path;
        all choices are exactly greedy with identical keep-sets.

    Returns (det_boxes (D,4), det_scores (D,), det_classes (D,) int32,
    det_valid (D,)) with D = max_total, score-sorted descending.
    """
    r, c = scores.shape
    fg = c - class_offset
    if boxes.ndim == 2:
        boxes_pc = jnp.broadcast_to(boxes[:, None, :], (r, c, 4))
    else:
        boxes_pc = boxes
    # (FG, R, ...) layouts for vmap over classes
    cls_boxes = jnp.moveaxis(boxes_pc[:, class_offset:, :], 1, 0)
    cls_scores = jnp.moveaxis(scores[:, class_offset:], 1, 0)
    cls_valid = valid[None, :] & (cls_scores > score_thresh)

    if max_per_class >= max_total:
        # Single-call fast path: when the per-class cap cannot bind (the
        # first max_total survivors in global score order ARE the final
        # output, and no single class can place more than max_total boxes
        # among them), per-class NMS + merge is EXACTLY one grouped greedy
        # NMS over the flattened (class, roi) set — suppression is masked
        # to same-class pairs via ``groups``, so the keep-set is
        # bit-identical to the vmapped per-class path.  This replaces FG
        # fixpoint loops + FG top-ks with one of each (both VOC and COCO
        # test configs take this path; the general path below remains the
        # spec and serves max_per_class < max_total).
        flat_boxes_in = cls_boxes.reshape(fg * r, 4)
        flat_scores_in = cls_scores.reshape(fg * r)
        flat_valid_in = cls_valid.reshape(fg * r)
        flat_groups = jnp.repeat(
            jnp.arange(fg, dtype=jnp.int32), r, total_repeat_length=fg * r)
        impl = nms_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            from trcnn.ops.nms_pallas import nms_padded_pallas

            keep_idx, keep_valid = nms_padded_pallas(
                flat_boxes_in, flat_scores_in, flat_valid_in,
                iou_thresh, max_out=max_total, groups=flat_groups)
        else:
            keep_idx, keep_valid = nms_padded(
                flat_boxes_in, flat_scores_in, flat_valid_in,
                iou_thresh, max_out=max_total, tile=tile, groups=flat_groups)
        det_scores = jnp.take(flat_scores_in, keep_idx)
        det_boxes = jnp.take(flat_boxes_in, keep_idx, axis=0)
        det_classes = (keep_idx // r + class_offset).astype(jnp.int32)
        det_scores = jnp.where(keep_valid, det_scores, 0.0)
        det_boxes = jnp.where(keep_valid[:, None], det_boxes, 0.0)
        det_classes = jnp.where(keep_valid, det_classes, 0)
        return det_boxes, det_scores, det_classes, keep_valid

    nms_fn = functools.partial(nms_padded, max_out=max_per_class, tile=tile)
    keep_idx, keep_valid = jax.vmap(nms_fn, in_axes=(0, 0, 0, None))(
        cls_boxes, cls_scores, cls_valid, iou_thresh
    )  # (FG, K), (FG, K)

    g_boxes = jnp.take_along_axis(cls_boxes, keep_idx[..., None], axis=1)
    g_scores = jnp.take_along_axis(cls_scores, keep_idx, axis=1)
    g_scores = jnp.where(keep_valid, g_scores, _NEG_INF)
    g_classes = jnp.broadcast_to(
        jnp.arange(class_offset, c, dtype=jnp.int32)[:, None], (fg, max_per_class)
    )

    flat_scores = g_scores.reshape(-1)
    flat_boxes = g_boxes.reshape(-1, 4)
    flat_classes = g_classes.reshape(-1)

    top_scores, top_i = lax.top_k(flat_scores, max_total)
    det_valid = top_scores > _NEG_INF
    det_boxes = jnp.take(flat_boxes, top_i, axis=0)
    det_classes = jnp.where(det_valid, jnp.take(flat_classes, top_i), 0)
    det_scores = jnp.where(det_valid, top_scores, 0.0)
    det_boxes = jnp.where(det_valid[:, None], det_boxes, 0.0)
    return det_boxes, det_scores, det_classes, det_valid


def nms_oracle_numpy(boxes, scores, iou_thresh):
    """Pure-numpy O(n^2) greedy NMS — the reference semantics of
    py-faster-rcnn's ``py_cpu_nms`` lineage, kept as the test oracle
    (SURVEY.md §5 kernel-parity strategy)."""
    import numpy as np

    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    # stable descending sort (ties -> lower index first)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1.0)
        h = np.maximum(0.0, yy2 - yy1 + 1.0)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= iou_thresh]
    return keep
