"""Flow post-processing: filters -> mask -> kernel -> direction -> clip.

Parity reference: transflow/flow/sources/source.py:337-363 (post_process).
The whole chain is built once per pipeline (static config) and traced into
the per-frame step. The forward->backward conversion replaces the reference's
numpy.put sequential scatter with the deterministic last-write-wins scatter
(ops/scatter.py) — bit-identical result, fully parallel.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import Direction
from .filters import FlowFilter
from ..ops.image import conv2d_same
from ..ops.scatter import scatter_last_wins


def clip_to_frame(flow):
    """Clamp so every target x+fx stays in [0, W-1] and y+fy in [0, H-1].

    Parity: source.py:250-263,361-362 (fx_min/fx_max/fy_min/fy_max tables)."""
    h, w = flow.shape[:2]
    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = jnp.clip(flow[..., 0], -jj, (w - 1) - jj)
    fy = jnp.clip(flow[..., 1], -ii, (h - 1) - ii)
    return jnp.stack([fx, fy], axis=-1)


def forward_to_backward(flow):
    """Convert a forward flow into a backward mapping.

    Parity: source.py:349-360 — round, scatter base coordinates along the
    flow (last write in flat order wins, numpy.put semantics), subtract base.
    """
    h, w = flow.shape[:2]
    n = h * w
    flow = clip_to_frame(flow)
    flow_int = jnp.round(flow).astype(jnp.int32)
    flow_flat = (flow_int[..., 1] * w + flow_int[..., 0]).ravel()
    base = jnp.arange(n, dtype=jnp.int32)
    targets = jnp.clip(base + flow_flat, 0, n - 1)
    mask = flow_flat != 0
    ii = (base // w).astype(jnp.float32)
    jj = (base % w).astype(jnp.float32)
    coords = jnp.stack([jj, ii], axis=-1)  # (N, 2) = (x, y)
    scattered = scatter_last_wins(coords, targets, mask, coords)
    return (scattered - coords).reshape(h, w, 2)


def make_postprocess(flow_filters: Sequence[FlowFilter] | str | None = None,
                     mask: np.ndarray | None = None,
                     kernel: np.ndarray | None = None,
                     direction: Direction = Direction.BACKWARD):
    """Build the fused post-process fn(flow, t[, mask]) -> flow.

    The (H, W) float mask travels as a call argument, not a closure constant
    (large embedded constants trigger pathological XLA compiles on TPU);
    ``fn.mask`` carries the default device array and ``fn.has_mask`` tells
    callers whether to pass it."""
    if isinstance(flow_filters, str):
        flow_filters = FlowFilter.parse_many(flow_filters)
    filters = tuple(flow_filters or ())
    # numpy, not jnp: closure-captured device buffers trigger a pathological
    # TPU slow path (see compositor LayerParams docstring); numpy closures
    # bake in as in-trace literals, and callers pass the (large) mask as a
    # device argument anyway
    mask_arr = None if mask is None else np.asarray(mask, dtype=np.float32)
    has_mask = mask_arr is not None
    kernel_arr = None if kernel is None else np.asarray(kernel,
                                                        dtype=np.float32)

    def postprocess(flow, t, mask=None):
        flow = flow.astype(jnp.float32)
        for flt in filters:
            flow = flt(flow, t)
        if has_mask:
            if mask is None:
                mask = mask_arr
            m = mask[..., None] if mask.ndim == 2 else mask
            flow = flow * m
        if kernel_arr is not None:
            fx = conv2d_same(flow[..., 0], kernel_arr)
            fy = conv2d_same(flow[..., 1], kernel_arr)
            flow = jnp.stack([fx, fy], axis=-1)
        if direction == Direction.FORWARD:
            flow = forward_to_backward(flow)
        return clip_to_frame(flow)

    postprocess.mask = mask_arr
    postprocess.has_mask = has_mask
    return postprocess
