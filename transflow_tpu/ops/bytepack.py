"""Byte-packing for multi-plane gathers.

The compositor's movement step reads several (H, W[, C]) planes at the
same gathered coordinates (masks, alpha, the mapping pair, source — see
compositor/core.py::_movement). XLA's TPU gather pays per-slice: five
narrow (1-4 B) gathers cost ~5x one 7-B gather over the same indices
(the same wall the LiteFlowNet tap-batched backwarp measured,
flow/estimators/liteflownet.py::backwarp). These helpers bitcast every
plane to uint8 lanes and concatenate them into ONE (H, W, B) byte image
so the whole read is a single gather; unpacking bitcasts back, so the
round trip is bit-exact for every dtype (bools travel as 0/1 bytes).
"""
import jax
import jax.numpy as jnp

__all__ = ["pack_planes", "unpack_planes"]


def _to_bytes(p):
    """(H, W[, C]) any-dtype -> ((H, W, k) uint8, lane count)."""
    if p.dtype == jnp.bool_:
        p = p.astype(jnp.uint8)
    if p.ndim == 2:
        p = p[..., None]
    if p.dtype != jnp.uint8:
        p = jax.lax.bitcast_convert_type(p, jnp.uint8)  # (H, W, C, itemsize)
        p = p.reshape(p.shape[0], p.shape[1], -1)
    return p, p.shape[-1]


def pack_planes(planes):
    """Pack same-(H, W) planes into one (H, W, B) uint8 image.

    Returns (packed, spec); feed the gathered pack to ``unpack_planes``
    with the same spec to recover each plane's dtype and rank exactly."""
    parts, spec, off = [], [], 0
    for p in planes:
        b, width = _to_bytes(p)
        parts.append(b)
        spec.append((p.dtype, p.ndim, p.shape[2] if p.ndim == 3 else 1,
                     off, width))
        off += width
    return jnp.concatenate(parts, axis=-1), tuple(spec)


def unpack_planes(packed, spec):
    """Inverse of ``pack_planes`` over a (possibly gathered) byte pack."""
    out = []
    for dtype, ndim, channels, off, width in spec:
        b = packed[..., off:off + width]
        if dtype == jnp.bool_:
            p = (b != 0) if ndim == 3 else (b[..., 0] != 0)
        elif dtype == jnp.uint8:
            p = b if ndim == 3 else b[..., 0]
        else:
            itemsize = width // channels
            b = b.reshape(b.shape[0], b.shape[1], channels, itemsize)
            p = jax.lax.bitcast_convert_type(b, dtype)  # (H, W, C)
            if ndim == 2:
                p = p[..., 0]
        out.append(p)
    return out
