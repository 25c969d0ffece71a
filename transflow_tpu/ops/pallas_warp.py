"""Pallas TPU kernel: bounded-displacement bilinear backwarp.

XLA's TPU gather is byte-throughput-bound at ~10 GB/s regardless of axis
or slice size (measured — flow/estimators/liteflownet.py::backwarp), which
caps the CNN's dominant op far below HBM bandwidth. When the per-pixel
displacement is BOUNDED by K, the gather decomposes into on-chip selects:

  1. load one haloed 2-D tile of the image into VMEM (Element-indexed
     overlapping blocks, same pattern as ops/pallas_correlation.py);
  2. for each (dy, dx) in the (2K+2)^2 displacement window, slice the
     tile (a VMEM slice — no HBM traffic) and accumulate it under the
     bilinear-tap weight that matches that offset;
  3. skip offsets no pixel in the tile uses (@pl.when on the weight
     max) — real flow fields are smooth, so a tile's displacement range
     is usually tiny and the loop degenerates to a handful of passes.
     Tiles are 2-D (block_rows x block_cols) precisely so BOTH the dy
     and the dx range localize: a full-width row band spans the whole
     field's x-offset range and defeats the dx skip (measured 2.2x).

STATUS — measured on v5e (24-deep data-dependent chains, the only
honest method through this environment's ~40 ms/dispatch tunnel floor),
level-2 shape (544, 960, 64), K=16: XLA gather 14.0 ms/op; this kernel
18.1 ms on near-constant (pan) flows and 80.8 ms on fast-varying smooth
fields. The kernel does NOT currently beat the gather: the haloed
Element-block band DMA moves (rows, cols, C) tiles whose contiguous HBM
runs are only C*2 = 128 bytes, and short-segment DMA rides the same
~10-20 GB/s wall as the gather it replaces (a copy-only kernel with the
same band spec costs the same as the warp). Compute cost is
O(active_offsets x tile x C) VPU FMAs — the offset skips work (white
noise 365 ms -> pan 18 ms) — so the op is DMA-bound, not select-bound.
Retained as an opt-in EXPERIMENT (TRANSFLOW_LITEFLOWNET_WARP_BOUND /
lfn_warp_bound): a future variant needs a fundamentally faster band
feed (full-width rows are 135 KB-contiguous, but kill the dx skip;
or an MXU selection-matrix formulation for the x-interp).

SEMANTICS: exact vs the reference grid_sample (zeros padding,
align_corners) whenever floor(displacement) is in [-K, K] per axis;
beyond that the displacement CLAMPS to the window (same contract as
ops/halo_gather.py). Callers must pick K >= the flow's real bound for
exactness — the LiteFlowNet integration keeps the exact gather as the
default and enables this kernel only via an explicit bound.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # Element-indexed block dims (halo reads); private path in jax 0.9
    from jax.experimental.pallas import Element
except ImportError:  # pragma: no cover
    from jax._src.pallas.core import Element

__all__ = ["bounded_backwarp", "mxu_backwarp"]


def _col_pad(bound: int) -> int:
    """Column-side halo: >= bound+1, rounded so the band's second-minor
    dim (cols + 2*pad_c) stays divisible by 8 — a Mosaic block-shape
    requirement for partial blocks (rows use bound+1 as-is: the major
    dim of a 3-D block is unconstrained)."""
    return -(-(bound + 1) // 4) * 4


def _make_kernel(bound: int, rows: int, cols: int):
    pad = bound + 1
    pad_c = _col_pad(bound)
    n = 2 * bound + 2

    def kernel(y0_ref, x0_ref, wy_ref, wx_ref, band_ref, out_ref):
        y0 = y0_ref[...]
        x0 = x0_ref[...]
        wy = wy_ref[...]
        wx = wx_ref[...]
        out_ref[...] = jnp.zeros_like(out_ref)

        # dy runs in a fori_loop (dynamic offsets are legal on the major
        # dim); dx unrolls statically — Mosaic cannot dynamically slice
        # the sublane axis at non-8-multiple offsets, but static shifts
        # lower fine. @pl.when skips offsets no pixel in the tile uses
        # (smooth flow => a handful of live (dy, dx) pairs per tile).
        def body(dyi, carry):
            dy = dyi - bound
            wy_t = jnp.where(y0 == dy, 1.0 - wy,
                             jnp.where(y0 == dy - 1, wy, 0.0))

            @pl.when(jnp.max(wy_t) > 0.0)
            def _():
                row_band = band_ref[pl.ds(pad + dy, rows), :, :]
                for dxi in range(n):
                    dx = dxi - bound
                    wx_t = jnp.where(x0 == dx, 1.0 - wx,
                                     jnp.where(x0 == dx - 1, wx, 0.0))
                    weight = wy_t * wx_t

                    @pl.when(jnp.max(weight) > 0.0)
                    def _():
                        sub = row_band[:, pad_c + dx:pad_c + dx + cols, :]
                        out_ref[...] += (sub.astype(jnp.float32)
                                         * weight[..., None])

            return carry

        jax.lax.fori_loop(0, n, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("bound", "block_rows",
                                             "block_cols", "interpret"))
def bounded_backwarp(image, flow, bound: int, block_rows: int | None = None,
                     block_cols: int | None = None, interpret: bool = False):
    """Bilinear warp ``image[(i, j) + flow]`` with displacement clamped to
    ``bound`` pixels per axis. image: (H, W, C); flow: (H, W, 2) in
    pixels (x, y) like the reference; returns float32 (H, W, C).

    The band is staged in bf16 regardless of input dtype (the CNN's
    compute dtype anyway): Mosaic requires the 2-D blocks' rows divisible
    by 8, and an 8-row f32 band blows the ~16 MB scoped-vmem budget once
    double-buffered — bf16 taps are consistent with this mode's
    approximation contract (weights and accumulation stay f32)."""
    h, w, c = image.shape
    image = image.astype(jnp.bfloat16)
    if block_rows is None:
        block_rows = 8
    if block_cols is None:
        block_cols = 256
    pad = bound + 1
    fy = flow[..., 1].astype(jnp.float32)
    fx = flow[..., 0].astype(jnp.float32)
    y0f = jnp.floor(fy)
    x0f = jnp.floor(fx)
    wy = fy - y0f
    wx = fx - x0f
    y0 = jnp.clip(y0f, -bound, bound).astype(jnp.int32)
    x0 = jnp.clip(x0f, -bound, bound).astype(jnp.int32)

    nr = -(-h // block_rows)
    hp = nr * block_rows
    block_cols = min(block_cols, -(-w // 128) * 128)
    nc = -(-w // block_cols)
    wp = nc * block_cols

    def pad2(a, fill=0):
        return jnp.pad(a, ((0, hp - h), (0, wp - w)),
                       constant_values=fill)

    # zero-pad the image so out-of-frame taps read zeros (grid_sample
    # 'zeros' padding); the halo keeps every in-window slice in range
    pad_c = _col_pad(bound)
    img = jnp.pad(image, ((pad, pad + hp - h), (pad_c, pad_c + wp - w),
                          (0, 0)))

    plane = pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(bound, block_rows, block_cols),
        grid=(nr, nc),
        in_specs=[
            plane, plane, plane, plane,
            pl.BlockSpec(
                (Element(block_rows + 2 * pad),
                 Element(block_cols + 2 * pad_c), Element(c)),
                lambda i, j: (i * block_rows, j * block_cols, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, block_cols, c),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp, c), jnp.float32),
        # the 64-channel lane dim pads to 128 on-chip, doubling the
        # double-buffered band + f32 out blocks past the default 16 MB
        # scoped-vmem budget — raise it (v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pad2(y0, bound + 7), pad2(x0, bound + 7), pad2(wy), pad2(wx), img)
    return out[:h, :w]


# ---------------------------------------------------------------------------
# MXU selection-matrix variant: exact in x, bounded in y.
# ---------------------------------------------------------------------------

def _make_mxu_kernel(bound: int, rows: int, w: int, w_ext: int, c: int):
    pad = bound + 1
    n = 2 * bound + 2

    def kernel(y0_ref, xidx_ref, wy_ref, wx_ref, band_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)
        iota = jax.lax.broadcasted_iota(jnp.int32, (w, w_ext), 1)
        for row in range(rows):  # static unroll: 8 output rows per block
            xidx = xidx_ref[row, :][:, None]       # (W, 1) band column of x0
            wxr = wx_ref[row, :].astype(jnp.bfloat16)[:, None]
            y0r = y0_ref[row, :]
            wyr = wy_ref[row, :]
            # 2-nonzero x-interp selection matrix, built in VMEM (never
            # touches HBM): row o holds (1-wx) at x0's band column and wx
            # at x0+1's. Out-of-frame taps (xidx 0 or W+1 edges map into
            # the zero-padded band columns) contribute zeros — grid_sample
            # 'zeros' padding falls out of the compare, no masks needed.
            sel = (jnp.where(iota == xidx, jnp.bfloat16(1.0) - wxr,
                             jnp.bfloat16(0.0))
                   + jnp.where(iota == xidx + 1, wxr, jnp.bfloat16(0.0)))

            def body(dyi, carry):
                dy = dyi - bound
                wy_t = jnp.where(y0r == dy, 1.0 - wyr,
                                 jnp.where(y0r == dy - 1, wyr, 0.0))

                @pl.when(jnp.max(wy_t) > 0.0)
                def _():
                    brow = band_ref[pl.ds(pad + row + dy, 1), :, :]
                    brow = brow.reshape(w_ext, c)
                    tap = jax.lax.dot_general(
                        sel, brow, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (W, C) on MXU
                    out_ref[row, :, :] += wy_t[:, None] * tap

                return carry

            jax.lax.fori_loop(0, n, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("bound", "block_rows",
                                             "interpret"))
def mxu_backwarp(image, flow, bound: int, block_rows: int = 8,
                 interpret: bool = False):
    """Bilinear warp, EXACT in x, displacement clamped to ``bound`` in y.

    The dx-bounded select kernel above is DMA-bound: its 2-D haloed tiles
    move 128-byte contiguous segments, riding the same ~10-20 GB/s wall as
    the gather it replaces. This variant restructures the op for the MXU:

      1. the grid is 1-D over 8-row blocks; each block DMAs a full-width
         row band (rows +- bound+1) whose HBM segments are whole rows
         (W*C*2 bytes ~ 123 KB at level 2) — long-segment DMA at real
         HBM bandwidth, total band traffic (1 + 2*pad/8)x the image;
      2. per output row, the x-interpolation is a 2-nonzero selection
         matrix S (W x W_ext, bf16) built on-chip by iota-compare —
         x needs NO bound: any horizontal displacement is one matmul;
      3. per (row, dy) with any live bilinear weight, one MXU dot
         S @ band_row -> (W, C) f32, scaled by the f32 y-weights and
         accumulated; dy offsets no pixel uses are skipped (@pl.when),
         so smooth flows degenerate to ~2-4 dots per row.

    Worst case (all 2K+2 dy live everywhere) at level 2 (544, 960, 64),
    K=16: 2.6 TFLOP ~ 7-13 ms on a v5e MXU — at parity with the 14 ms XLA
    gather; typical flows are several times cheaper. Taps are staged bf16
    with the x-weight folded into S (bf16); y-weights and accumulation
    stay f32 — same approximation class as ``bounded_backwarp``.

    Semantics: exact vs grid_sample (zeros padding, align_corners) for any
    x displacement; y clamps to [-bound, bound] like ``bounded_backwarp``.
    """
    h, w, c = image.shape
    image = image.astype(jnp.bfloat16)
    pad = bound + 1
    fy = flow[..., 1].astype(jnp.float32)
    fx = flow[..., 0].astype(jnp.float32)
    y0f = jnp.floor(fy)
    x0f = jnp.floor(fx)
    wy = fy - y0f
    wx = fx - x0f
    y0 = jnp.clip(y0f, -bound, bound).astype(jnp.int32)
    # band column of the x0 tap: the ABSOLUTE source column (column index
    # plus integer displacement), shifted +1 because band columns carry
    # one zero column on the left (so column -1 selects a zero) and
    # clipped into the right zero padding so far out-of-frame taps stay
    # zero. floor(o + fx) == o + floor(fx) exactly (o is an integer).
    # lower clip is -2 (not -1): a pair fully left of the frame must zero
    # BOTH taps — xidx -1 matches no band column and xidx+1 hits the zero
    # pad, whereas clipping to -1 would alias the +1 tap onto column 0
    col = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xidx = (jnp.clip(col + x0f, -2, w) + 1).astype(jnp.int32)

    nr = -(-h // block_rows)
    hp = nr * block_rows
    w_ext = -(-(w + 3) // 128) * 128

    def pad2(a, fill=0):
        return jnp.pad(a, ((0, hp - h), (0, 0)), constant_values=fill)

    img = jnp.pad(image, ((pad, pad + hp - h), (1, w_ext - w - 1), (0, 0)))

    plane = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_mxu_kernel(bound, block_rows, w, w_ext, c),
        grid=(nr,),
        in_specs=[
            plane, plane, plane, plane,
            pl.BlockSpec(
                (Element(block_rows + 2 * pad), Element(w_ext), Element(c)),
                lambda i: (i * block_rows, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pad2(y0, bound + 7), pad2(xidx), pad2(wy), pad2(wx), img)
    return out[:h]
