"""Pallas TPU kernel for the 7x7 cost-volume correlation.

TPU-native equivalent of the reference's CUDA correlation kernel
(transflow/flow/methods/liteflownet.py:48-116). The XLA formulation
(ops/correlation.py) re-reads the shifted feature map from HBM for each of
the 49 displacements; this kernel loads one f1 row-band plus one haloed f2
row-band into VMEM once and computes all 49 channel-dot-products from
on-chip memory — ~49x less HBM traffic on the hot path.

The halo is expressed with Element-indexed block dims: the f2 band is
(tile_h + 6*stride) rows tall while its index map advances by tile_h rows,
so consecutive grid steps read overlapping windows of the pre-padded buffer.
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

from .correlation import MAX_DISP, WINDOW


def _kernel(f1_ref, f2_ref, out_ref):
    """Stride-free band kernel: f2_ref is the haloed band (pad = MAX_DISP).

    Bands may be staged bf16 (the CNN's feature dtype — half the DMA);
    the products and channel reduction are f32 either way, so a bf16-fed
    call computes exactly what the f32 path computes on the same bf16
    values."""
    f1 = f1_ref[...].astype(jnp.float32)
    tile_h, w = f1_ref.shape[0], f1_ref.shape[1]
    inv_c = 1.0 / f1_ref.shape[2]
    for dy in range(-MAX_DISP, MAX_DISP + 1):
        for dx in range(-MAX_DISP, MAX_DISP + 1):
            ch = (dy + MAX_DISP) * WINDOW + (dx + MAX_DISP)
            window = f2_ref[pl.ds(MAX_DISP + dy, tile_h),
                            pl.ds(MAX_DISP + dx, w), :]
            out_ref[:, :, ch] = (
                jnp.sum(f1 * window.astype(jnp.float32), axis=-1) * inv_c)


def _pick_tile_h(h: int, w: int, c: int, itemsize1: int = 4,
                 itemsize2: int = 4) -> int:
    """Largest row band that divides h and fits the VMEM budget.

    The budget covers ALL per-step blocks — f1 band, haloed f2 band, and
    the f32 (tile_h, w, 49) output band. The output term matters: it is
    ~3x the f1 band at level 2 (49 x 4 B/px vs 32 x 2), so a budget that
    ignored it would let bf16 staging double tile_h and nearly double the
    true VMEM residency vs the configuration measured on device."""
    budget = 10 << 20
    best = 1
    for tile_h in range(1, h + 1):
        if h % tile_h:
            continue
        f1_bytes = tile_h * w * c * itemsize1
        f2_bytes = ((tile_h + 2 * MAX_DISP) * (w + 2 * MAX_DISP) * c
                    * itemsize2)
        out_bytes = tile_h * w * WINDOW * WINDOW * 4
        if f1_bytes + f2_bytes + out_bytes <= budget:
            best = tile_h
    return best


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def pallas_correlation7x7(f1, f2, stride: int = 1, interpret: bool = False):
    """Drop-in replacement for ops.correlation.correlation7x7.

    Stride 2 reduces to the stride-1 kernel on even-grid subsamples: all
    taps sit at even offsets of the (3*stride)-padded buffer, so
    out = corr1(f1[::2, ::2], pad(f2, 6)[::2, ::2])."""
    h, w, c = f1.shape
    pad = MAX_DISP * stride
    # Each input stages in ITS OWN dtype: a bf16 operand stays bf16 in
    # HBM/VMEM (half that band's DMA — the CNN's feature dtype) while an
    # f32 operand stays f32. Keying both off f1 would silently quantize
    # the common mixed case — feat1 is bf16 but the backwarped feat2
    # arrives f32 (bilinear weights are f32) — and bf16->f32 is the only
    # exact direction. The kernel computes in f32 either way.
    stage1 = jnp.bfloat16 if f1.dtype == jnp.bfloat16 else jnp.float32
    stage2 = jnp.bfloat16 if f2.dtype == jnp.bfloat16 else jnp.float32
    f1 = f1.astype(stage1)
    f2p = jnp.pad(f2.astype(stage2), ((pad, pad), (pad, pad), (0, 0)))
    if stride > 1:
        f1 = f1[::stride, ::stride]
        f2p = f2p[::stride, ::stride]
    oh, ow = f1.shape[:2]
    tile_h = _pick_tile_h(oh, ow, c, jnp.dtype(stage1).itemsize,
                          jnp.dtype(stage2).itemsize)
    return pl.pallas_call(
        _kernel,
        grid=(oh // tile_h,),
        in_specs=[
            pl.BlockSpec((tile_h, ow, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (Element(tile_h + 2 * MAX_DISP), Element(ow + 2 * MAX_DISP),
                 Element(c)),
                lambda i: (i * tile_h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, ow, WINDOW * WINDOW),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((oh, ow, WINDOW * WINDOW),
                                       jnp.float32),
        interpret=interpret,
    )(f1, f2p)
