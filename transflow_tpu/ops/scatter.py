"""Deterministic scatter primitives.

The reference resolves scatter collisions through numpy.put's sequential
last-write-wins order (transflow/utils.py:421-430 putn, and
transflow/flow/sources/source.py:349-360 forward->backward conversion). A TPU
needs an order-independent formulation: we reduce with a scatter-max over the
*flat write order*, which reproduces "last write in flat order wins" exactly
while staying fully parallel and deterministic.
"""
import jax.numpy as jnp


def scatter_any(target_shape: tuple[int, ...], flat_indices, mask):
    """Boolean occupancy: out.flat[i] = any(mask[p] for p with flat_indices[p]==i).

    ``flat_indices`` may contain arbitrary values where ``mask`` is False (they
    are redirected out of range and dropped).
    """
    size = 1
    for dim in target_shape:
        size *= dim
    idx = jnp.where(mask, flat_indices.ravel(), size)
    out = jnp.zeros((size,), dtype=jnp.int32)
    out = out.at[idx.ravel()].max(
        mask.ravel().astype(jnp.int32), mode="drop")
    return (out > 0).reshape(target_shape)


def scatter_last_wins(values, flat_indices, mask, default):
    """out.flat[i] = values.flat[p*] where p* is the LAST p (in flat order)
    with mask[p] and flat_indices[p] == i; default.flat[i] elsewhere.

    Exactly numpy.put semantics for masked writes. values/default may have a
    trailing channel dimension; flat_indices/mask are flat (N,) over the
    leading dimensions.

    Implementation: scatter-max of (flat write order + 1) per target cell
    (associative, so safe with duplicates), then a gather of the winning
    writer's value.
    """
    n = flat_indices.shape[0]
    size = default.shape[0] if default.ndim == 1 else default.reshape(
        (-1,) + default.shape[flat_indices.ndim:]).shape[0]
    order = jnp.arange(1, n + 1, dtype=jnp.int32)
    idx = jnp.where(mask, flat_indices, size)
    winner = jnp.zeros((size,), dtype=jnp.int32)
    winner = winner.at[idx].max(jnp.where(mask, order, 0), mode="drop")
    has_writer = winner > 0
    picked = jnp.take(values, jnp.maximum(winner - 1, 0), axis=0)
    if values.ndim > 1:
        has_writer = has_writer.reshape((-1,) + (1,) * (values.ndim - 1))
    return jnp.where(has_writer, picked, default)
