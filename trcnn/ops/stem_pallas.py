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
pre-im2col'd in XLA into 36-lane patches (window rows 3 x cols 4 per packed
output pair, base ``2k - 2``), and the kernel computes it as one
``(M, 36) @ (36, 128)`` dot straight into the packed layout.

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


def _pack_w1(w1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, C) HWIO conv1_1 kernel → (12*Cin, 2C) patch matrix.

    Patch lane order is (dy, j, px, ci) — j ∈ {0, 1} the two parity-merged
    input columns (k-1+j), px the parity within — covering input cols
    2k + (2j + px) - 2.  Packed output col x = 2k + p - 1 needs taps
    x + dj, so W1m[(dy, j, px, ci), (p, c)] = w1[dy, 2j + px - p, ci, c]
    for 0 <= 2j+px-p <= 2, else 0.
    """
    z = jnp.zeros_like(w1[:, 0])                          # (3, Cin, C)
    blocks = []
    for p in (0, 1):
        rows = []
        for j in (0, 1):
            for px in (0, 1):
                dx = 2 * j + px - p
                rows.append(w1[:, dx] if 0 <= dx <= 2 else z)
        blocks.append(jnp.stack(rows, axis=1))            # (3, 4, Cin, C)
    w1m = jnp.stack(blocks, axis=3)                       # (3, 4, Cin, 2, C)
    cin, c = w1.shape[2:]
    return w1m.reshape(12 * cin, 2 * c)


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


def _patches_packed(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, Cin) → conv1_1 input patches (B, H+2, W/2+1, 12*Cin).

    Patch (r, k) holds input rows r-2..r (r = conv1_1 row + 1, covering the
    row halo y ∈ {-1, H}) x cols 2k-2..2k+1, lane order (dy, j, px, ci) —
    matching _pack_w1.  Built from ONE parity reshape (W → W/2 column
    pairs on lanes) + six UNSTRIDED shifted slices: step-2 strided slices
    of the raw image lower to while-loops on TPU (~10 ms/b32 measured),
    this form is two plain copy passes (~1.5 ms).
    """
    b, h, w, cin = x.shape
    xs = x.reshape(b, h, w // 2, 2 * cin)
    xsp = jnp.pad(xs, ((0, 0), (2, 2), (1, 1), (0, 0)))
    wk = w // 2 + 1
    slices = []
    for dy in range(3):
        for j in range(2):
            slices.append(xsp[:, dy:dy + h + 2, j:j + wk, :])
    return jnp.concatenate(slices, axis=-1)               # (B, H+2, wk, 12Cin)


def _kernel(cur_ref, nxt_ref, w1_ref, w2_ref, b1_ref, b2_ref, out_ref,
            x1p_ref, y2_ref, *, r_pool: int, wk: int, t_count: int):
    # All compute is expressed as 2D (M, K) @ (K, N) dots + 2D VPU ops —
    # Mosaic rejects the rank-3 forms here (shape casts over the odd
    # wk = W/2 + 1 sublane extent, strided slices as >2D gathers).
    t = pl.program_id(1)
    rows = 2 * r_pool + 2
    dtype = out_ref.dtype
    half = x1p_ref.shape[-1] // 2

    # ---- conv1_1: per-row (wk, 36) @ (36, 2C) dots into packed layout ---
    # zero the SAME-padding halo AFTER bias+relu (relu(bias) != 0):
    # packed col (0, p=0) is x = -1, (wk-1, p=1) is x = W; row 0 of tile 0
    # is conv row -1, last row of the last tile is conv row H.
    kidx = lax.broadcasted_iota(jnp.int32, (wk, 2 * half), 0)
    lidx = lax.broadcasted_iota(jnp.int32, (wk, 2 * half), 1)
    col_halo = (((kidx == 0) & (lidx < half))
                | ((kidx == wk - 1) & (lidx >= half)))
    w1m = w1_ref[...]
    for r in range(rows):
        # tile t's patch rows [2Rt, 2Rt+2R+2): the first 2R come from this
        # tile's block, the 2-row tail from the NEXT tile's block (second
        # input stream — avoids materializing overlapping halo tiles)
        src = cur_ref[0, r] if r < 2 * r_pool else nxt_ref[0, r - 2 * r_pool]
        acc1 = jnp.dot(src, w1m,
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
    wk = w // 2 + 1
    t_count = h // (2 * r_pool)
    rows = 2 * r_pool + 2
    dtype = x.dtype
    kdim = 12 * cin

    pat = _patches_packed(x).astype(dtype)                # (B, H+2, wk, 12Cin)
    w1m = _pack_w1(w1.astype(dtype))
    w2m = _pack_w2(w2.astype(dtype))
    b1p = jnp.tile(b1.astype(dtype), 2)[None]             # (1, 2C)
    b2p = jnp.tile(b2.astype(dtype), 2)[None]

    grid = (b, t_count)
    rp = r_pool  # capture as local: BlockSpec lambdas must not close over self
    in_specs = [
            pl.BlockSpec((1, 2 * rp, wk, kdim),
                         lambda bb, tt: (bb, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, wk, kdim),
                         lambda bb, tt: (bb, rp * (tt + 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kdim, 2 * c), lambda bb, tt: (0, 0),
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
                        pltpu.VMEM((2 * r_pool, wk - 1, 2 * c), dtype)],
        interpret=interpret,
    )(pat, pat, w1m, w2m, b1p, b2p)


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
