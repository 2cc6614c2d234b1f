"""Fused Pallas kernel for the VGG stem: conv1_1 → ReLU → conv1_2 → ReLU →
2x2 max pool, in one VMEM-resident pass.

Why: the 64-channel stem is the least MXU-efficient part of the network and
XLA's conv emitters leave ~2.5-3x on the table there (b32 trace: conv1_1
8.8 ms, conv1_2 19.4 ms, pool1 8.9 ms ≈ 24% of the whole detect step).  Two
structural fixes, neither expressible at the XLA level:

  1. **Parity-packed lanes**: a 64-channel NHWC array wastes half of every
     128-wide VPU/MXU lane.  We store two adjacent pixel columns in one
     lane row — layout ``P[y, k, (p, c)] = X[y, 2k + p - 1]`` (the -1 keeps
     a zero halo column at each edge for SAME padding).  conv1_2's 3x3
     window over outputs ``x_out = 2k + s`` then decomposes into exactly
     SIX accumulating ``(M,128) @ (128,128)`` MXU matmuls — dy ∈ {0,1,2}
     crossed with a k-shift off ∈ {0,1} — whose left operands are plain
     shifted *slices* of the packed buffer (zero in-VMEM patch copies) and
     whose right operands are pre-packed weight matrices
     ``W2m[dy, off][(p, ci), (s, co)] = W2[dy, 2*off + p - s, ci, co]``
     (out-of-range taps zero).  Full 128-lane utilization at the cost of
     4/3x dense FLOPs — a measured net win over the 2x lane padding.
  2. **Fusion**: conv1_1's output (the largest intermediate in the whole
     network, 2.5 GB/b32 in bf16) never touches HBM; neither does conv1_2's
     (pooling happens in registers — pool pairs (2k, 2k+1) are exactly the
     packed (s=0, s=1) lanes of one k-column).

conv1_1's 3 input channels cannot fill lanes either way, so its input is
im2col'd into 36-lane patches (window rows 3 x cols 4 per packed output
pair, base ``2k - 2``) and computed as one ``(M, 36) @ (36, 128)`` dot
straight into the packed layout.  The patch tensor is built IN KERNEL
from a transposed packed image ``(B, H+4, 2*Cin, W/2+2)`` — six shifted
``(2*Cin, wk)`` copies into an 8-aligned-sublane ``(48, wk)`` scratch,
consumed by a TN ``dot_general`` (contraction on the sublane dim).
Materializing the patches in XLA instead costs 7.4 ms/b32: the 36-lane
concat is built in a transposed layout and then relayout-copied (5.2 ms)
to the standard layout Pallas requires.  The transposed source is one
fused XLA transpose pass (~1 pass over the 113 MB packed image).

Numerics match the XLA path (bf16 MXU dots, f32 accumulation, bias + ReLU
applied in the compute dtype) up to f32-accumulation ordering inside the
3x3 window — the same caveat as any conv re-tiling.  Parity is tested in
interpret mode against the lax.conv reference (tests/test_stem_pallas.py)
and on chip by the verify harness.

Replaces (on TPU): the reference's first two convolution layers + pool of
``VGG16`` (SURVEY.md §3.1); the XLA path in trcnn/models/vgg16.py remains
the numerical spec and the CPU/backward implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_w1t(w1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, C) HWIO conv1_1 kernel → (48, 2C) patch-row matrix.

    Patch ROW order is six 8-aligned sublane groups i = 2*dy + j —
    j ∈ {0, 1} the two parity-merged input columns (k-1+j) — each holding
    (px, ci) in its first 2*Cin rows, covering input cols
    2k + (2j + px) - 2.  Packed output col x = 2k + p - 1 needs taps
    x + dj, so W1T[8i + px*Cin + ci, (p, c)] = w1[dy, 2j + px - p, ci, c]
    for 0 <= 2j+px-p <= 2, else 0.  The 8 - 2*Cin slack rows per group are
    zero: the in-kernel patch scratch writes (2*Cin, wk) pieces at
    8-aligned sublane offsets (Mosaic-friendly) and the zero weight rows
    nullify whatever the slack rows hold.
    """
    cin, c = w1.shape[2:]
    if 2 * cin > 8:
        raise ValueError(f"stem kernel supports Cin <= 4, got {cin}")
    z = jnp.zeros((cin, c), w1.dtype)
    groups = []
    for dy in range(3):
        for j in (0, 1):
            pxci = []
            for px in (0, 1):
                per_p = []
                for p in (0, 1):
                    dx = 2 * j + px - p
                    per_p.append(w1[dy, dx] if 0 <= dx <= 2 else z)
                pxci.append(jnp.stack(per_p, axis=1))     # (Cin, 2, C)
            g = jnp.stack(pxci, axis=0).reshape(2 * cin, 2 * c)
            groups.append(jnp.pad(g, ((0, 8 - 2 * cin), (0, 0))))
    return jnp.concatenate(groups, axis=0)                # (48, 2C)


def _pack_w1t_phases(w1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, C) → (3, 48, 2C): the three dy-rotations of _pack_w1t.

    The kernel keeps its patch scratch's sublane groups in CYCLIC row
    slots (image row ri lives in slot ri % 3) so that advancing one patch
    row rewrites only the newly-entering image row (2 of 6 groups) instead
    of all six.  The dot then uses phase p = r % 3, whose slot s carries
    dy = (s - p) mod 3.
    """
    base = _pack_w1t(w1)
    phases = []
    for p in range(3):
        order = []
        for s in range(3):
            dy = (s - p) % 3
            order.append(base[16 * dy:16 * (dy + 1)])     # groups (dy, j=0/1)
        phases.append(jnp.concatenate(order, axis=0))
    return jnp.stack(phases)                              # (3, 48, 2C)


def _pack_w2(w2: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, C) HWIO conv1_2 kernel → (3, 2, 2C, 2C) slice matrices.

    W2m[dy, off][(p, ci), (s, co)] = w2[dy, 2*off + p - s, ci, co] for
    0 <= 2*off+p-s <= 2 (else 0): output x_out = 2k + s, tap col
    x_out + dj sits in packed col (k + off, p) with dj + 1 = 2*off + p - s.
    """
    c = w2.shape[2]
    z = jnp.zeros_like(w2[:, 0])                          # (3, C, C)
    per = []
    for off in (0, 1):
        rows = []
        for p in (0, 1):
            cols = []
            for s in (0, 1):
                dx = 2 * off + p - s
                cols.append(w2[:, dx] if 0 <= dx <= 2 else z)
            rows.append(jnp.stack(cols, axis=2))          # (3, C, 2, C)
        per.append(jnp.stack(rows, axis=1))               # (3, 2, C, 2, C)
    w2m = jnp.stack(per, axis=1)                          # (3, 2, 2, C, 2, C)
    return w2m.reshape(3, 2, 2 * c, 2 * c)


def _packed_image_t(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, Cin) → transposed packed image (B, H+4, 2*Cin, W/2+2).

    One parity reshape (W → W/2 column pairs on lanes — a pure bitcast),
    SAME-pad halos (2 rows each side covering conv row -1/H plus the dy
    window, 1 packed col each side), then a W↔C transpose so the packed
    channel dim (2*Cin = 6) sits on SUBLANES and the column dim on lanes.
    This is the layout the kernel's patch builder wants, and XLA lowers
    the whole chain (uint8 prep included) into a single relayout pass —
    materializing the full 36-lane patch tensor in XLA instead costs
    ~7.4 ms/b32 (transposed-layout build + relayout copy).
    """
    b, h, w, cin = x.shape
    xs = x.reshape(b, h, w // 2, 2 * cin)
    xsp = jnp.pad(xs, ((0, 0), (2, 2), (1, 1), (0, 0)))
    return jnp.transpose(xsp, (0, 1, 3, 2))               # (B, H+4, 2Cin, wk+1)


def _kernel(cur_ref, nxt_ref, w1_ref, w2_ref, b1_ref, b2_ref, out_ref,
            x1p_ref, y2_ref, patt_ref, *, r_pool: int, wk: int,
            t_count: int):
    # All compute is expressed as 2D (M, K) @ (K, N) dots + 2D VPU ops —
    # Mosaic rejects the rank-3 forms here (shape casts over the odd
    # wk = W/2 + 1 sublane extent, strided slices as >2D gathers).
    t = pl.program_id(1)
    rows = 2 * r_pool + 2
    dtype = out_ref.dtype
    half = x1p_ref.shape[-1] // 2
    c2 = cur_ref.shape[2]                                 # 2*Cin

    # ---- conv1_1: per-row TN dot (48, wk)^T-contract (48, 2C) ----------
    # zero the SAME-padding halo AFTER bias+relu (relu(bias) != 0):
    # packed col (0, p=0) is x = -1, (wk-1, p=1) is x = W; row 0 of tile 0
    # is conv row -1, last row of the last tile is conv row H.
    kidx = lax.broadcasted_iota(jnp.int32, (wk, 2 * half), 0)
    lidx = lax.broadcasted_iota(jnp.int32, (wk, 2 * half), 1)
    col_halo = (((kidx == 0) & (lidx < half))
                | ((kidx == wk - 1) & (lidx >= half)))
    if c2 < 8:
        # slack rows of each 8-aligned group: W1T's matching rows are
        # zero, but uninitialized VMEM can decode to NaN (NaN * 0 = NaN)
        for i in range(6):
            patt_ref[8 * i + c2:8 * (i + 1), :] = jnp.zeros((8 - c2, wk),
                                                            dtype)

    def write_row(ri):
        # transposed-image row ri of the tile window (first 2R rows from
        # this tile's block, the 4-row tail from the next tile's — the
        # second input stream avoids materializing overlapping halo
        # tiles) → its two shifted (2Cin, wk) pieces land in the CYCLIC
        # sublane slot ri % 3 of the (48, wk) patch scratch
        src = (cur_ref[0, ri] if ri < 2 * r_pool
               else nxt_ref[0, ri - 2 * r_pool])          # (2Cin, wk+1)
        for j in range(2):
            g = 2 * (ri % 3) + j
            patt_ref[8 * g:8 * g + c2, :] = src[:, j:j + wk]

    # patch row r needs image rows r..r+2: rows r, r+1 are already in
    # their slots from the previous iterations — only r+2 enters.
    # Building the 36-lane patch tensor in XLA instead costs a
    # 7.4 ms/b32 transposed-layout build + relayout copy.
    write_row(0)
    write_row(1)
    for r in range(rows):
        write_row(r + 2)
        acc1 = lax.dot_general(patt_ref[...], w1_ref[r % 3],
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        y1 = jnp.maximum(acc1.astype(dtype) + b1_ref[...], 0)
        row_halo = (((t == 0) & (r == 0))
                    | ((t == t_count - 1) & (r == rows - 1)))
        x1p_ref[r] = jnp.where(col_halo | row_halo, jnp.zeros_like(y1), y1)

    # ---- conv1_2: six full-lane MXU dots over shifted packed slices -----
    for r in range(2 * r_pool):
        acc = jnp.zeros((wk - 1, 2 * half), jnp.float32)
        for dy in range(3):
            for off in range(2):
                acc += jnp.dot(x1p_ref[dy + r, off:off + wk - 1, :],
                               w2_ref[dy, off],
                               preferred_element_type=jnp.float32)
        y2_ref[r] = jnp.maximum(acc.astype(dtype) + b2_ref[...], 0)

    # ---- 2x2 max pool: row pairs x the packed (s=0, s=1) lane halves ----
    for i in range(r_pool):
        m = jnp.maximum(y2_ref[2 * i], y2_ref[2 * i + 1])
        out_ref[0, i] = jnp.maximum(m[:, :half], m[:, half:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_stem_block1(x: jnp.ndarray,
                      w1: jnp.ndarray, b1: jnp.ndarray,
                      w2: jnp.ndarray, b2: jnp.ndarray,
                      r_pool: int = 4,
                      interpret: bool = False) -> jnp.ndarray:
    """conv1_1 + ReLU + conv1_2 + ReLU + 2x2/2 max pool, fused.

    FROZEN-STEM ONLY: the custom VJP returns zero cotangents — exactly the
    reference recipe's conv1/conv2 freeze (= a stop_gradient at the block
    boundary).  The VGG16 module only selects this kernel when
    ``freeze_stem`` is set; use the XLA path to train the stem.

    Args:
      x:  (B, H, W, Cin) input, H % (2*r_pool) == 0, W even; compute runs in
          x.dtype (bf16 on TPU).
      w1: (3, 3, Cin, C) HWIO conv1_1 kernel (Cin small, C = 64);
      w2: (3, 3, C, C) conv1_2 kernel; b1/b2: (C,) biases.
      r_pool: pooled output rows per grid step (VMEM tile height).

    Returns (B, H/2, W/2, C) pooled features.
    """
    return _fused_impl(x, w1, b1, w2, b2, r_pool, interpret)


def _stem_fwd(x, w1, b1, w2, b2, r_pool, interpret):
    out = _fused_impl(x, w1, b1, w2, b2, r_pool, interpret)
    # residuals must be JAX values; zero-size leading slices carry the
    # full shape/dtype of each argument at zero bytes
    return out, tuple(a[:0] for a in (x, w1, b1, w2, b2))


def _stem_bwd(r_pool, interpret, res, g):
    xe, w1e, b1e, w2e, b2e = res

    def zeros(e, n):
        return jnp.zeros((n,) + e.shape[1:], e.dtype)

    # the batch extent was sliced away in the residual; recover it from g
    return (zeros(xe, g.shape[0]),
            zeros(w1e, 3), zeros(b1e, w1e.shape[3]),
            zeros(w2e, 3), zeros(b2e, w2e.shape[3]))


fused_stem_block1.defvjp(_stem_fwd, _stem_bwd)


@functools.partial(jax.jit, static_argnames=("r_pool", "interpret"))
def _fused_impl(x, w1, b1, w2, b2, r_pool, interpret):
    b, h, w, cin = x.shape
    c = w1.shape[-1]
    if h % (2 * r_pool) or w % 2:
        raise ValueError(f"canvas {h}x{w} not tileable (r_pool={r_pool})")
    if r_pool % 2:
        raise ValueError("r_pool must be even (the 4-row tail stream sits "
                         "at block offset r_pool*(t+1)/2)")
    wk = w // 2 + 1
    t_count = h // (2 * r_pool)
    rows = 2 * r_pool + 2
    dtype = x.dtype
    c2 = 2 * cin

    xt = _packed_image_t(x).astype(dtype)                 # (B, H+4, 2Cin, wk+1)
    w1m = _pack_w1t_phases(w1.astype(dtype))              # (3, 48, 2C)
    w2m = _pack_w2(w2.astype(dtype))
    b1p = jnp.tile(b1.astype(dtype), 2)[None]             # (1, 2C)
    b2p = jnp.tile(b2.astype(dtype), 2)[None]

    grid = (b, t_count)
    rp = r_pool  # capture as local: BlockSpec lambdas must not close over self
    in_specs = [
            pl.BlockSpec((1, 2 * rp, c2, wk + 1),
                         lambda bb, tt: (bb, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, c2, wk + 1),
                         lambda bb, tt: (bb, rp * (tt + 1) // 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 48, 2 * c), lambda bb, tt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2, 2 * c, 2 * c), lambda bb, tt: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, r_pool, w // 2, c),
                            lambda bb, tt: (bb, tt, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, r_pool=r_pool, wk=wk, t_count=t_count)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((rows, wk, 2 * c), dtype),
                        pltpu.VMEM((2 * r_pool, wk - 1, 2 * c), dtype),
                        pltpu.VMEM((48, wk), dtype)],
        interpret=interpret,
    )(xt, xt, w1m, w2m, b1p, b2p)


def stem_block1_reference(x, w1, b1, w2, b2):
    """lax.conv reference of the same block (the XLA/flax semantics: conv
    output in the compute dtype, bias + relu in that dtype)."""
    dn = lax.conv_dimension_numbers(x.shape, w1.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    dtype = x.dtype

    def conv(v, w, bias):
        o = lax.conv_general_dilated(v, w.astype(dtype), (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        return jnp.maximum(o.astype(dtype) + bias.astype(dtype), 0)

    y = conv(conv(x, w1, b1), w2, b2)
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")
