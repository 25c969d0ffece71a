"""Shift-select warp: bounded-displacement bilinear sampling without gathers.

The round-5 healthy-window probes measured XLA's TPU gather lowering at
0.6-1.8 GB/s effective on random per-pixel gathers while the same window
sustained 153 TFLOPs of matmul — a ~400x gap to HBM bandwidth
(bench_attempts/round5/gather_wall_1080p_healthy_1044.json). The Farneback
warp (`_update_flow`'s bilinear sample of the image-2 coefficient planes at
x + d) is the single largest gather in the flagship program (45.5 ms per
1080p instance, ~180 ms of the 342 ms/frame default slope), yet its access
pattern is LOCAL: the displacement d is a smooth flow field, almost always
within a few dozen pixels.

A local warp does not need a gather. Clamp the displacement to
``[-radius, radius]``; then along ONE axis the clamped floor anchor
satisfies ``s0 - i in [-radius, radius]``, so the axis warp is a SELECT
over ``2*radius+1`` statically-shifted copies of the source — shifts are
contiguous slices, selects are vector compares, and XLA fuses the chain
into VMEM-tiled elementwise loops (each output tile reads the input tile
plus a radius-row halo ONCE at HBM bandwidth, instead of per-pixel
serialized gather descriptors). The 2-D warp composes two axis warps
(rows, then columns) — the classic two-pass warp (Catmull & Smith 1980).
Same select-decomposition idea as the compositor's pan-mode
`movement_select`, generalized to bilinear taps.

Exactness: bilinear interpolation itself is separable, so the two-pass
result equals the joint ``bilinear_sample`` (ops/image.py) whenever the
ROW displacement field is locally constant along the columns it is
transported across — i.e. ``dy[i, j + dx]  == dy[i, j]`` (pans, axis-
separable fields, and smooth flows to first order). For general smooth
flow the error is O(|dx| * d(dy)/dx), far below the winsize-15
aggregation scale of the Farneback solver that consumes it; quality is
pinned end-to-end by PSNR tests (tests/test_flow_ops.py). Displacements
beyond the radius clamp to the radius-limited sample instead of
producing garbage.
"""
import functools

import jax
import jax.numpy as jnp

__all__ = ["shift_select_warp", "axis_warp"]


def _shift(p, s: int, axis: int):
    """p advanced by static ``s`` along ``axis`` with edge replication."""
    if s == 0:
        return p
    n = p.shape[axis]
    idx = [slice(None)] * p.ndim
    edge = [slice(None)] * p.ndim
    if s > 0:
        idx[axis] = slice(s, n)
        edge[axis] = slice(n - 1, n)
        parts = [p[tuple(idx)],
                 jnp.repeat(p[tuple(edge)], s, axis=axis)]
    else:
        idx[axis] = slice(0, n + s)
        edge[axis] = slice(0, 1)
        parts = [jnp.repeat(p[tuple(edge)], -s, axis=axis),
                 p[tuple(idx)]]
    return jnp.concatenate(parts, axis=axis)


def axis_warp(p, disp, radius: int, axis: int) -> jax.Array:
    """Bilinear warp of ``p`` (H, W, C) by ``disp`` (H, W) along one axis.

    Samples ``p`` at ``i + clip(disp, -radius, radius)`` along ``axis``
    via shift-select: floor anchor and its +1 neighbor are selects over
    statically-shifted copies (edge-replicated, matching the gather
    path's clamp-to-edge taps), then one lerp. No gather anywhere."""
    n = p.shape[axis]
    # the clamped floor anchor bounds rel to [-(n-1), n-1] regardless of
    # the requested radius (coarse pyramid levels can be smaller than
    # it), so wider shifts can never be selected — skip them
    radius = min(radius, n - 1)
    base = jax.lax.broadcasted_iota(jnp.int32, p.shape[:2], axis)
    s = base.astype(jnp.float32) + jnp.clip(disp, -radius, radius)
    s0f = jnp.floor(s)
    w = (s - s0f)[..., None]
    s0 = jnp.clip(s0f.astype(jnp.int32), 0, n - 1)
    rel = s0 - base  # in [-radius, radius] by construction
    m = rel == -radius
    sel0 = jnp.where(m[..., None], _shift(p, -radius, axis), 0)
    sel1 = jnp.where(m[..., None], _shift(p, -radius + 1, axis), 0)
    for k in range(-radius + 1, radius + 1):
        m = (rel == k)[..., None]
        sel0 = jnp.where(m, _shift(p, k, axis), sel0)
        # the +1 tap of the last in-bounds anchor clamps to the edge
        sel1 = jnp.where(m, _shift(p, min(k + 1, n - 1), axis), sel1)
    return sel0 * (1 - w) + sel1 * w


@functools.partial(jax.jit, static_argnames=("radius",))
def shift_select_warp(image, dy, dx, radius: int) -> jax.Array:
    """Sample ``image`` (H, W, C) at ``(i + dy, j + dx)``, gather-free.

    Two-pass: rows first (vertical displacement), then columns on the
    row-warped intermediate. Agrees with
    ``bilinear_sample(image, i + dy, j + dx)`` to float tolerance for
    pans / separable / smooth in-radius fields (see module docstring);
    larger displacements clamp to the radius."""
    rows = axis_warp(image, dy, radius, axis=0)
    return axis_warp(rows, dx, radius, axis=1)
