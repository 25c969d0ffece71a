"""Bounded-displacement 2-D gather that shards without all-gathers.

The compositor's movement step reads ``v[src_i, src_j]`` where
``src_i = clip(i + di, 0, H-1)`` comes from the per-frame flow. A direct
2-D gather on an H-sharded array forces GSPMD to all-gather the full
operand every frame (measured — see parallel/mesh.py). But per-frame
displacements are bounded (|di| <= halo for any sane flow), so the gather
decomposes into

  1. 2*halo+1 row SHIFTS of the operand — XLA partitions a shift of an
     H-sharded array into a ``collective-permute`` of exactly |d| boundary
     rows (the halo-exchange pattern, rides ICI neighbors), and
  2. a row-local gather along W (unsharded -> no communication), and
  3. a per-pixel select on the row offset.

Cost: O(halo) elementwise passes instead of O(1) gather — a deliberate
compute-for-communication trade that wins when the ``space`` axis is wide
enough for the all-gather to dominate. Exactness: for |src_i - i| <= halo
the result is bit-identical to ``v[src_i, src_j]``; larger displacements
are clamped to the halo window (callers pick halo >= the flow clip bound).

This formulation is pure jax (no shard_map), so it composes with vmap,
scan and GSPMD sharding constraints unchanged.
"""
import jax
import jax.numpy as jnp

__all__ = ["bounded_row_gather"]


def bounded_row_gather(v, src_i, src_j, halo: int):
    """``v[src_i, src_j]`` for row displacements bounded by ``halo``.

    v: (H, W) or (H, W, C); src_i/src_j: (H, W) int32, src_i pre-clipped to
    [0, H-1]. Row reach beyond the halo window is clamped (pick halo >= the
    flow's |dy| bound for exactness).

    The operand is edge-padded ONCE by ``halo`` rows; each of the 2*halo+1
    row-shifted views is then a pure slice of the padded array, so GSPMD
    materializes the halo exchange once instead of once per shift."""
    h, w = v.shape[0], v.shape[1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    di = jnp.clip(src_i - ii, -halo, halo)
    idx_j = src_j[..., None] if v.ndim == 3 else src_j
    top = jnp.broadcast_to(v[0:1], (halo,) + v.shape[1:])
    bottom = jnp.broadcast_to(v[h - 1:h], (halo,) + v.shape[1:])
    padded = jnp.concatenate([top, v, bottom], axis=0)
    out = jnp.zeros((h, w) + v.shape[2:], dtype=v.dtype)
    for d in range(-halo, halo + 1):
        # shifted[i] = v[clip(i + d, 0, H-1)]
        shifted = jax.lax.slice_in_dim(padded, halo + d, halo + d + h, axis=0)
        # row-local gather along W (axis 1): no cross-shard reach
        row_gathered = jnp.take_along_axis(shifted, idx_j, axis=1)
        sel = di == d
        if v.ndim == 3:
            sel = sel[..., None]
        out = jnp.where(sel, row_gathered, out)
    return out
