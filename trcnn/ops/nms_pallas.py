"""Pallas TPU kernel for fixed-shape greedy NMS.

TPU-native replacement for the reference's CUDA ``nms_kernel.cu`` 64-box
bitmask-tile design (SURVEY.md §3.3).  Same greedy semantics as
``trcnn.ops.nms.nms_padded`` (the portable XLA spec, oracle-tested); this
kernel keeps the whole suppression state in VMEM and walks score-ordered
tiles of T boxes:

  * per tile: the greedy recurrence is resolved as a Jacobi fixpoint over
    the T×T IoU matrix (converges in suppression-chain depth; exact —
    same algorithm as the XLA path), then one dense (N×T) IoU computation
    suppresses all later boxes against the tile's survivors;
  * box coordinates are pre-split into per-coordinate (1, N) rows so every
    IoU is pure 8×128-lane VPU math — no gathers, no (N, 4) layout
    transposes inside the loop;
  * ALL state (coords, suppression flags, IoU tiles) stays in VMEM for the
    kernel's whole lifetime — no HBM round-trip per fixpoint iteration,
    which is what the XLA formulation pays.

The input sort and the output compaction (top-k over kept positions) stay
in XLA where they are already optimal; the kernel does the O(N²) IoU work,
which is the hot part.

``nms_padded_pallas`` matches ``nms_padded``'s signature/return exactly.
The proposal layer selects between the two via ``ProposalConfig.nms_impl``
(default "auto": THIS kernel on TPU — 1.6x the XLA path at the clustered
12000-box train shape — the XLA spec elsewhere); benchmarks/bench_nms.py
measures both at the production shapes.  interpret=True runs the kernel on CPU in CI (SURVEY.md §6.2
sanitizer path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = np.float32(-np.inf)


def _suppression_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref,
                        *rest_refs, tile: int, max_out: int,
                        col_block: int, has_groups: bool):
    """Computes keep mask (1, N) for score-sorted boxes.

    Refs hold (1, N) rows in VMEM (coordinates pre-masked so padding rows
    never suppress anything); thresh in SMEM.  All keep/suppression state
    is int32 (0/1) — Mosaic cannot reshape/relayout sub-32-bit vectors
    (e.g. (T,)i1 → (T,1)i1), so bool state would block the column/row
    orientation changes the algorithm needs.

    Cross-tile suppression walks ``col_block``-wide blocks of the column
    SUFFIX after the tile (greedy order: earlier boxes are never killed by
    later ones), instead of one (T, N) matrix over all columns — the
    prefix half of that matrix was masked to a no-op anyway.  ~45% less
    IoU math at the 12k-box train shape, and the (T, col_block)
    intermediate is VMEM-bounded independent of N.

    ``has_groups``: an extra (1, N) int32 group-id row rides in VMEM and
    suppression is masked to same-group pairs — the single-call multiclass
    fast path (grouped NMS over the flattened (class, roi) set is
    bit-identical to independent per-class NMS, see trcnn.ops.nms).
    """
    if has_groups:
        group_ref, thresh_ref, keep_ref = rest_refs
    else:
        group_ref = None
        thresh_ref, keep_ref = rest_refs
    n = x1_ref.shape[1]
    num_tiles = n // tile
    thresh = thresh_ref[0]

    pos = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    # keep state lives in the output ref; start = valid (int32 0/1)
    keep_ref[:] = valid_ref[:]

    def tile_body(t, _):
        start = t * tile
        # tile coordinate columns: (T, 1)
        tx1 = x1_ref[0, pl.ds(start, tile)].reshape(tile, 1)
        ty1 = y1_ref[0, pl.ds(start, tile)].reshape(tile, 1)
        tx2 = x2_ref[0, pl.ds(start, tile)].reshape(tile, 1)
        ty2 = y2_ref[0, pl.ds(start, tile)].reshape(tile, 1)
        tarea = (tx2 - tx1 + 1.0) * (ty2 - ty1 + 1.0)
        t_tarea = thresh * tarea                              # (T, 1)

        valid_col = keep_ref[0, pl.ds(start, tile)].reshape(tile, 1)  # (T,1)
        row_ids = lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        # tile-vs-tile IoU from the tile coords directly ((T,1) vs (1,T)
        # broadcasts — pallas TPU cannot dynamic_slice the (T, N) matrix)
        uxx1 = jnp.maximum(tx1, tx1.reshape(1, tile))
        uyy1 = jnp.maximum(ty1, ty1.reshape(1, tile))
        uxx2 = jnp.minimum(tx2, tx2.reshape(1, tile))
        uyy2 = jnp.minimum(ty2, ty2.reshape(1, tile))
        uw = jnp.maximum(uxx2 - uxx1 + 1.0, 0.0)
        uh = jnp.maximum(uyy2 - uyy1 + 1.0, 0.0)
        uinter = uw * uh
        # division-free predicate: inter/(a+b-inter) > t  ⟺
        # inter*(1+t) > t*(a+b) for positive areas — the VPU reciprocal
        # chain was the single costliest op of the IoU block.  Rounding
        # can differ from IEEE division within ~1 ulp of the threshold
        # (the reference's cpu_nms/gpu_nms pair diverges the same way).
        over_tt = (uinter * (1.0 + thresh)
                   > t_tarea + t_tarea.reshape(1, tile))
        if group_ref is not None:
            tg = group_ref[0, pl.ds(start, tile)].reshape(tile, 1)
            over_tt &= tg == tg.reshape(1, tile)
        # upper[r, c] = 1 iff row r suppresses col c (r strictly before c)
        upper = ((col_ids > row_ids) & over_tt).astype(jnp.int32)

        # within-tile greedy via the Jacobi fixpoint (same algorithm as
        # trcnn.ops.nms): keep[c] = valid[c] * (1 - max_r(keep[r]*over)),
        # converging in suppression-chain depth — a handful of (T, T)
        # matrix steps instead of T sequential row steps.  int32 math:
        # max over rows gives (1, T), int32 reshape to (T, 1) is legal.
        def step(k_col):
            killed = jnp.max(upper * k_col, axis=0, keepdims=True)  # (1,T)
            return valid_col * (1 - killed.reshape(tile, 1))

        def fix_cond(kk):
            k_old, k_new = kk
            return jnp.any(k_old != k_new)

        def fix_body(kk):
            _, k = kk
            return k, step(k)

        k0 = valid_col
        _, keep_col = lax.while_loop(fix_cond, fix_body, (k0, step(k0)))
        keep_ref[0, pl.ds(start, tile)] = keep_col.reshape(tile)

        # cross-tile: tile survivors kill every later box.  Column blocks
        # cover [start + tile, n); the last block is clamped back to
        # n - col_block (idempotent re-suppression of its overlap, and the
        # ``later_b`` mask keeps any reach-back before start + tile inert).
        suffix = n - (start + tile)
        nblocks = (suffix + col_block - 1) // col_block

        def col_body(j, _):
            # both min() operands are multiples of 128 (tile and col_block
            # are, and n is padded to a tile multiple), but Mosaic cannot
            # prove it through the clamp — assert the alignment for the
            # dynamic vector load/store
            cstart = pl.multiple_of(
                jnp.minimum(start + tile + j * col_block, n - col_block),
                128)
            bx1 = x1_ref[0, pl.ds(cstart, col_block)].reshape(1, col_block)
            by1 = y1_ref[0, pl.ds(cstart, col_block)].reshape(1, col_block)
            bx2 = x2_ref[0, pl.ds(cstart, col_block)].reshape(1, col_block)
            by2 = y2_ref[0, pl.ds(cstart, col_block)].reshape(1, col_block)
            barea = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
            xx1 = jnp.maximum(tx1, bx1)                   # (T, CB)
            yy1 = jnp.maximum(ty1, by1)
            xx2 = jnp.minimum(tx2, bx2)
            yy2 = jnp.minimum(ty2, by2)
            w = jnp.maximum(xx2 - xx1 + 1.0, 0.0)
            h = jnp.maximum(yy2 - yy1 + 1.0, 0.0)
            inter = w * h
            # division-free (see over_tt above)
            over_bool = inter * (1.0 + thresh) > t_tarea + thresh * barea
            if group_ref is not None:
                bgrp = group_ref[0, pl.ds(cstart, col_block)].reshape(
                    1, col_block)
                over_bool &= tg == bgrp
            over_b = over_bool.astype(jnp.int32)
            killed = jnp.max(over_b * keep_col, axis=0,
                             keepdims=True)               # (1, CB)
            bpos = (lax.broadcasted_iota(jnp.int32, (1, col_block), 1)
                    + cstart)
            later_b = (bpos >= start + tile).astype(jnp.int32)
            cur = keep_ref[0, pl.ds(cstart, col_block)]
            keep_ref[0, pl.ds(cstart, col_block)] = (
                cur * (1 - (killed * later_b).reshape(col_block)))
            return 0

        lax.fori_loop(0, nblocks, col_body, 0)

    # capacity-aware early exit (same contract as the XLA path's
    # while_loop): keep-flags of processed tiles are FINAL — later boxes
    # never suppress earlier ones — so once the finalized prefix holds
    # max_out survivors the remaining tiles are unreachable output and the
    # cross-IoU work for them is skipped entirely.
    def loop_cond(state):
        t, finalized = state
        return (t < num_tiles) & (finalized < max_out)

    def loop_body(state):
        t, _ = state
        tile_body(t, None)
        done = (pos < (t + 1) * tile).astype(jnp.int32)
        return t + 1, jnp.sum(keep_ref[:] * done)

    lax.while_loop(loop_cond, loop_body, (0, jnp.int32(0)))


def _pad_to_multiple(x, multiple, value):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                   constant_values=value)


@functools.partial(jax.jit,
                   static_argnames=("max_out", "tile", "interpret",
                                    "presorted"))
def nms_padded_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh,
    max_out: int,
    tile: Optional[int] = None,
    interpret: bool = False,
    presorted: bool = False,
    groups: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in Pallas variant of ``trcnn.ops.nms.nms_padded`` (including
    the ``presorted`` fast path and same-group-only suppression via
    ``groups`` — see that function's docstring)."""
    n_in = boxes.shape[0]
    if tile is None:
        # cross-suppression is column-blocked, so the (T, col_block)
        # intermediate is VMEM-bounded independent of N and T=256 serves
        # every shape (T=128 at the 12k train shape costs 2x the tile
        # trips for no VMEM relief; ≥512 deepens the in-tile greedy
        # fixpoint chains)
        tile = 256
    if presorted:
        order = jnp.arange(n_in, dtype=jnp.int32)
        sboxes = boxes.astype(jnp.float32)
        svalid = valid
        sgroups = groups
    else:
        # boxes/groups/index ride the sort as payload operands (same
        # rationale as trcnn.ops.nms: stable sort on -score is
        # tie-identical to top_k and beats (N, 4) row-gathers on TPU)
        masked = jnp.where(valid, scores.astype(jnp.float32), _NEG_INF)
        ops = (-masked, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
               jnp.arange(n_in, dtype=jnp.int32))
        if groups is not None:
            ops = ops + (groups,)
        out = lax.sort(ops, dimension=-1, is_stable=True, num_keys=1)
        sboxes = jnp.stack(out[1:5], axis=-1)
        order = out[5]
        svalid = -out[0] > _NEG_INF
        sgroups = out[6] if groups is not None else None

    sboxes = _pad_to_multiple(sboxes, tile, 0.0)
    svalid = _pad_to_multiple(svalid, tile, False)
    n = sboxes.shape[0]

    # push padding boxes far away so they never overlap real ones
    far = jnp.where(svalid, 0.0, -1e8)
    x1 = (sboxes[:, 0] + far).reshape(1, n)
    y1 = (sboxes[:, 1] + far).reshape(1, n)
    x2 = (sboxes[:, 2] + far).reshape(1, n)
    y2 = (sboxes[:, 3] + far).reshape(1, n)

    operands = [x1, y1, x2, y2, svalid.reshape(1, n).astype(jnp.int32)]
    if sgroups is not None:
        operands.append(
            _pad_to_multiple(sgroups.astype(jnp.int32), tile, -1
                             ).reshape(1, n))
    keep_i32 = pl.pallas_call(
        functools.partial(_suppression_kernel, tile=tile, max_out=max_out,
                          col_block=min(1024, n),
                          has_groups=sgroups is not None),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands, jnp.asarray([iou_thresh], jnp.float32))[0]
    keep = keep_i32 != 0

    pos = jnp.arange(n, dtype=jnp.int32)
    sel_key = jnp.where(keep, pos, n)
    neg_vals, _ = lax.top_k(-sel_key, max_out)
    keep_valid = neg_vals > -n
    keep_idx = jnp.take(order, (-neg_vals).astype(jnp.int32) % n_in, axis=0)
    keep_idx = jnp.where(keep_valid, keep_idx, 0).astype(jnp.int32)
    return keep_idx, keep_valid
