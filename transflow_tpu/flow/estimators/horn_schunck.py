"""Horn-Schunck optical flow as a jitted XLA stencil program.

Parity reference: transflow/flow/methods/horn_schunck.py:9-45 — Gaussian
pre-blur, derivative stencils, Jacobi-style iteration with a neighborhood
average kernel, alpha regularization, early stop on ||du||_2 < delta, warm
start ``decay * prev_flow``.

The iteration is a lax.while_loop of 3x3 stencil correlations — pure VPU
work that XLA fuses; no host round-trips.
"""
import functools

import jax
import jax.numpy as jnp

from ...ops.image import correlate2d_reflect, separable_correlate

import numpy as np

# Kernels are NUMPY constants on purpose: module-level jnp arrays are
# concrete device buffers, and closure-capturing a device buffer into a
# jitted program triggers a pathological slow path on this TPU backend
# (~10,000x; measured). numpy constants bake in as in-trace literals.
# cv2.GaussianBlur((5,5), sigma=0) uses the fixed binomial 5-tap kernel
_K5 = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0

_X_KERNEL = np.asarray([[1.0, -1.0], [1.0, -1.0]], np.float32) * 0.25
_Y_KERNEL = np.asarray([[1.0, 1.0], [-1.0, -1.0]], np.float32) * 0.25
_T_KERNEL = np.ones((2, 2), np.float32) * 0.25
_AVG_KERNEL = np.asarray([[1.0, 2.0, 1.0], [2.0, 0.0, 2.0],
                          [1.0, 2.0, 1.0]], np.float32) / 12.0


def _blur5(image):
    tmp = separable_correlate(image, _K5, axis=0, mode="reflect")
    return separable_correlate(tmp, _K5, axis=1, mode="reflect")


@functools.partial(jax.jit, static_argnames=("alpha", "max_iters", "decay",
                                             "delta"))
def horn_schunck(prev_gray, next_gray, prev_flow=None, *, alpha: float = 1.0,
                 max_iters: int = 3, decay: float = 0.0,
                 delta: float | None = 1.0):
    """Estimate (H, W, 2) float32 flow from two uint8 grayscale frames."""
    a = _blur5(prev_gray.astype(jnp.float32))
    b = _blur5(next_gray.astype(jnp.float32))
    if prev_flow is None:
        u = jnp.zeros_like(a)
        v = jnp.zeros_like(a)
    else:
        u = decay * prev_flow[..., 0].astype(jnp.float32)
        v = decay * prev_flow[..., 1].astype(jnp.float32)
    ex = correlate2d_reflect(a, _X_KERNEL) + correlate2d_reflect(b, _X_KERNEL)
    ey = correlate2d_reflect(a, _Y_KERNEL) + correlate2d_reflect(b, _Y_KERNEL)
    et = correlate2d_reflect(b, _T_KERNEL) - correlate2d_reflect(a, _T_KERNEL)
    denom = alpha ** 2 + ex ** 2 + ey ** 2

    def cond(carry):
        i, _, _, done = carry
        return (i < max_iters) & ~done

    def body(carry):
        i, u, v, _ = carry
        u_avg = correlate2d_reflect(u, _AVG_KERNEL)
        v_avg = correlate2d_reflect(v, _AVG_KERNEL)
        c = (ex * u_avg + ey * v_avg + et) / denom
        new_u = u_avg - ex * c
        new_v = v_avg - ey * c
        if delta is None:
            done = jnp.zeros((), dtype=jnp.bool_)
        else:
            done = jnp.sqrt(jnp.sum(jnp.square(new_u - u))) < delta
        return (i + 1, new_u, new_v, done)

    _, u, v, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), u, v, jnp.zeros((), dtype=jnp.bool_)))
    return jnp.stack([u, v], axis=-1).astype(jnp.float32)
