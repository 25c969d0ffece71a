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


def _stage_dtype(x):
    """Each input stages in ITS OWN dtype: a bf16 operand stays bf16 in
    HBM/VMEM (half that band's DMA — the CNN's feature dtype) while an
    f32 operand stays f32. Keying both off f1 would silently quantize
    the common mixed case — feat1 is bf16 but the backwarped feat2
    arrives f32 (bilinear weights are f32) — and bf16->f32 is the only
    exact direction. The kernel computes in f32 either way."""
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _corr_call(f1s, f2ps, interpret: bool):
    """Invoke the band kernel on pre-padded, pre-strided operands.

    ``f1s``: (oh, ow, c); ``f2ps``: (oh + 6, ow + 6, c) — the f2 buffer
    with MAX_DISP rows/cols of context on every side (zeros at true frame
    edges, neighbor-shard rows in the sharded entry point)."""
    oh, ow, c = f1s.shape
    tile_h = _pick_tile_h(oh, ow, c, f1s.dtype.itemsize, f2ps.dtype.itemsize)
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
    )(f1s, f2ps)


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def pallas_correlation7x7(f1, f2, stride: int = 1, interpret: bool = False):
    """Drop-in replacement for ops.correlation.correlation7x7.

    Stride 2 reduces to the stride-1 kernel on even-grid subsamples: all
    taps sit at even offsets of the (3*stride)-padded buffer, so
    out = corr1(f1[::2, ::2], pad(f2, 6)[::2, ::2])."""
    pad = MAX_DISP * stride
    f1 = f1.astype(_stage_dtype(f1))
    f2p = jnp.pad(f2.astype(_stage_dtype(f2)),
                  ((pad, pad), (pad, pad), (0, 0)))
    if stride > 1:
        f1 = f1[::stride, ::stride]
        f2p = f2p[::stride, ::stride]
    return _corr_call(f1, f2p, interpret)


def sharded_ok(h: int, n_space: int, stride: int) -> bool:
    """Whether ``sharded_pallas_correlation7x7`` applies at this shape.

    shard_map needs an exact H split; stride 2 additionally needs every
    shard to start on an even global row so the per-shard subsample hits
    the same grid as the global one. Tiny shards aren't worth a kernel
    launch + halo exchange."""
    if h % (n_space * stride):
        return False
    return h // (n_space * stride) >= 8


def sharded_pallas_correlation7x7(f1, f2, mesh, stride: int = 1,
                                  axis: str = "space",
                                  interpret: bool = False):
    """The band kernel under GSPMD H-sharding: shard_map + halo ppermute.

    A Pallas kernel is a ``tpu_custom_call`` with no SPMD partitioning
    rule, so it cannot trace over GSPMD-sharded operands — which used to
    force mesh runs onto the XLA shift formulation (orders of magnitude
    slower on the TPU backend, see ``correlation``'s docstring). The
    TPU-native answer is manual SPMD for exactly this op: shard_map over
    the mesh's ``axis``, each shard exchanging MAX_DISP*stride boundary
    rows of f2 with its neighbors over ICI (two collective-permutes of
    K*W*C bytes — the same neighbor-row pattern as ops/halo_gather), then
    running the unchanged band kernel on its (h/n + 2*halo)-row window.
    Every output pixel sees exactly the unsharded kernel's inputs:
    interior shards read true neighbor rows, edge shards read the zeros
    ppermute delivers to non-destinations — the global zero padding.
    Agreement with the unsharded kernel is at f32 rounding (1-2 ulp):
    the backend may retile the channel reduction for the different band
    shapes (observed on CPU interpret at c=32; often bit-equal).

    Requires ``sharded_ok(h, mesh.shape[axis], stride)``; callers fall
    back to the XLA formulation otherwise (trace-time decision, static
    shapes)."""
    h = f1.shape[0]
    n = mesh.shape[axis]
    if not sharded_ok(h, n, stride):
        raise ValueError(
            f"H={h} does not shard over {n} devices at stride {stride} "
            "(check sharded_ok first)")
    pad = MAX_DISP * stride
    stage1, stage2 = _stage_dtype(f1), _stage_dtype(f2)

    def body(f1_loc, f2_loc):
        f1_loc = f1_loc.astype(stage1)
        f2_loc = f2_loc.astype(stage2)
        # neighbor boundary rows; devices no permute targets (the global
        # top/bottom shards) receive zeros = the frame's zero padding
        top = jax.lax.ppermute(f2_loc[-pad:], axis,
                               [(i, i + 1) for i in range(n - 1)])
        bot = jax.lax.ppermute(f2_loc[:pad], axis,
                               [(i + 1, i) for i in range(n - 1)])
        f2p = jnp.pad(jnp.concatenate([top, f2_loc, bot], axis=0),
                      ((0, 0), (pad, pad), (0, 0)))
        f1s = f1_loc[::stride, ::stride] if stride > 1 else f1_loc
        f2ps = f2p[::stride, ::stride] if stride > 1 else f2p
        return _corr_call(f1s, f2ps, interpret)

    spec = jax.sharding.PartitionSpec(axis, None, None)
    # check_vma=False: pallas_call's ShapeDtypeStruct carries no varying-
    # mesh-axes annotation, and the body is manifestly per-shard + two
    # explicit ppermutes — nothing for the checker to catch here
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                         out_specs=spec, check_vma=False)(f1, f2)
