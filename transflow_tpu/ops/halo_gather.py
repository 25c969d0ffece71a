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

__all__ = ["bounded_row_gather", "sharded_bounded_gather"]


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


def sharded_bounded_gather(v, src_i, src_j, halo: int, mesh,
                           axis: str = "space"):
    """``bounded_row_gather`` as manual SPMD: one LOCAL gather per shard.

    The GSPMD-composable formulation above pays 2*halo+1 per-shift
    W-gathers + selects per call; under an explicit mesh, shard_map does
    the same job with the two neighbor-row collective-permutes (the exact
    halo-exchange pattern of ops/pallas_correlation.py::
    sharded_pallas_correlation7x7) followed by ONE local 2-D gather into
    the haloed row window. Bit-identical to ``bounded_row_gather`` (and to
    the plain ``v[src_i, src_j]`` whenever |src_i - i| <= halo): because
    ``src_i`` is pre-clipped in-frame, the clamped row reach never crosses
    a global frame edge, so the zero rows ppermute delivers to the
    top/bottom shards are never read.

    Requires v's H to divide evenly over ``mesh.shape[axis]`` AND a shard
    height of at least ``halo`` rows with ``halo >= 1`` (the exchange only
    reaches nearest neighbors, and ``v_loc[-0:]`` would misalign the
    window); callers fall back to ``bounded_row_gather`` otherwise
    (trace-time decision)."""
    h, w = v.shape[0], v.shape[1]
    n = mesh.shape[axis]
    if h % n:
        raise ValueError(f"H={h} does not shard over {n} devices")
    if halo < 1 or h // n < halo:
        raise ValueError(
            f"halo={halo} needs 1 <= halo <= shard height {h // n} "
            "(neighbor-only exchange); use bounded_row_gather")
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    di = jnp.clip(src_i - ii, -halo, halo)

    def body(v_loc, di_loc, sj_loc):
        top = jax.lax.ppermute(v_loc[-halo:], axis,
                               [(i, i + 1) for i in range(n - 1)])
        bot = jax.lax.ppermute(v_loc[:halo], axis,
                               [(i + 1, i) for i in range(n - 1)])
        padded = jnp.concatenate([top, v_loc, bot], axis=0)
        hl = v_loc.shape[0]
        li = (jax.lax.broadcasted_iota(jnp.int32, (hl, w), 0)
              + halo + di_loc)
        return padded[li, sj_loc]

    def spec(ndim):
        return jax.sharding.PartitionSpec(axis, *([None] * (ndim - 1)))

    # check_vma=False: the body is per-shard work + two explicit
    # ppermutes, mirroring the sharded correlation entry
    return jax.shard_map(body, mesh=mesh,
                         in_specs=(spec(v.ndim), spec(2), spec(2)),
                         out_specs=spec(v.ndim), check_vma=False)(
        v, di, src_j)
