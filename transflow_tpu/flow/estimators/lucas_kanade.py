"""Dense pyramidal Lucas-Kanade optical flow in JAX.

Parity reference: transflow/flow/methods/lukas_kanade.py:9-36, which tracks
every ``step``-th pixel with cv2.calcOpticalFlowPyrLK and Kronecker-broadcasts
to macroblocks. The TPU formulation solves the windowed 2x2 structure-tensor
system *densely* at every pixel — the natural data-parallel form (cf. the
reference's own WebGL shader extra/www/shaders/flowLucasKanade.frag) — then
subsamples + kron-broadcasts when ``step > 1`` to match the macroblock look.
"""
import functools

import jax
import jax.numpy as jnp

from ...ops.image import (bilinear_sample_packed, box_filter, downsample2x,
                          prepack_bilinear_taps, separable_correlate)

import numpy as np

# numpy on purpose — see horn_schunck.py: module-level device buffers
# captured by jit trigger a pathological TPU slow path
_SCHARR = np.asarray([-3.0, 0.0, 3.0], np.float32) / 32.0
_SCHARR_SMOOTH = np.asarray([3.0, 10.0, 3.0], np.float32)


def _scharr(image, axis: int):
    """Scharr derivative along axis (cv2 LK uses Scharr /32 derivatives)."""
    d = separable_correlate(image, _SCHARR, axis=axis)
    return separable_correlate(d, _SCHARR_SMOOTH, axis=1 - axis)


def _lk_level(prev, nxt, flow, win_size: int, iters: int, eps: float):
    h, w = prev.shape
    ix = _scharr(prev, axis=1)
    iy = _scharr(prev, axis=0)
    g11 = box_filter(ix * ix, win_size)
    g12 = box_filter(ix * iy, win_size)
    g22 = box_filter(iy * iy, win_size)
    det = g11 * g22 - g12 * g12
    # minimum-eigenvalue style validity: fall back to zero update
    valid = det > 1e-6
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # nxt is loop-invariant across the ``iters`` updates: build the bilinear
    # tap pack once, gather once per iteration (ops/image.py rationale)
    nxt_pack = prepack_bilinear_taps(nxt)

    def body(_, flow):
        warped = bilinear_sample_packed(
            nxt_pack, yy + flow[..., 1], xx + flow[..., 0])[..., 0]
        it = warped - prev
        b1 = -box_filter(ix * it, win_size)
        b2 = -box_filter(iy * it, win_size)
        du = (g22 * b1 - g12 * b2) * inv_det
        dv = (g11 * b2 - g12 * b1) * inv_det
        small = (du * du + dv * dv) < eps * eps
        du = jnp.where(small, 0.0, du)
        dv = jnp.where(small, 0.0, dv)
        return flow + jnp.stack([du, dv], axis=-1)

    return jax.lax.fori_loop(0, iters, body, flow)


@functools.partial(jax.jit,
                   static_argnames=("win_size", "max_level", "step", "iters"))
def lucas_kanade(prev_gray, next_gray, *, win_size: int = 15,
                 max_level: int = 2, step: int = 1, iters: int = 10):
    """Estimate (H, W, 2) float32 flow from two uint8 grayscale frames."""
    h, w = prev_gray.shape
    prev = prev_gray.astype(jnp.float32)
    nxt = next_gray.astype(jnp.float32)
    pyr_prev = [prev]
    pyr_next = [nxt]
    for _ in range(max_level):
        if min(pyr_prev[-1].shape) < 2 * win_size:
            break
        pyr_prev.append(downsample2x(pyr_prev[-1]))
        pyr_next.append(downsample2x(pyr_next[-1]))
    flow = jnp.zeros((*pyr_prev[-1].shape, 2), dtype=jnp.float32)
    for level in range(len(pyr_prev) - 1, -1, -1):
        lh, lw = pyr_prev[level].shape
        if flow.shape[:2] != (lh, lw):
            flow = 2.0 * jax.image.resize(flow, (lh, lw, 2), "bilinear")
        flow = _lk_level(pyr_prev[level], pyr_next[level], flow,
                         win_size, iters, 0.01)
    if step > 1:
        sampled = flow[::step, ::step]
        flow = jnp.repeat(jnp.repeat(sampled, step, axis=0), step, axis=1)
        flow = flow[:h, :w]
    return flow
