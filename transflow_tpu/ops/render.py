"""Flow visualization renderers (device-side).

Parity reference: transflow/output/render.py:9-48 (render1d, render2d).
"""
import jax.numpy as jnp

from ..utils import parse_color

DEFAULT_COLORS_1D = ("#000000", "#ffffff")
DEFAULT_COLORS_2D = ("#ffff00", "#0000ff", "#ff00ff", "#00ff00")


def render1d(arr, scale: float = 1.0, colors=None, binary: bool = False):
    """Map a scalar (H, W) field onto a 2-color gradient (or binary split)."""
    if colors is None:
        colors = DEFAULT_COLORS_1D
    c0 = jnp.asarray(parse_color(colors[0]), dtype=jnp.float32)
    c1 = jnp.asarray(parse_color(colors[1]), dtype=jnp.float32)
    arr = arr.astype(jnp.float32)[..., None]
    if binary:
        coeff = jnp.clip(jnp.round(scale * arr), 0.0, 1.0)
        coeff_a, coeff_b = 1.0 - coeff, coeff
    else:
        coeff_a = jnp.clip(1.0 - scale * arr, 0.0, 1.0)
        coeff_b = jnp.clip(scale * arr, 0.0, 1.0)
    frame = coeff_a * c0 + coeff_b * c1
    return jnp.clip(frame, 0, 255).astype(jnp.uint8)


def render2d(flow, scale: float = 1.0, colors=None):
    """Map a (H, W, 2) flow onto a 4-color additive mix (±x, ±y)."""
    if colors is None:
        colors = DEFAULT_COLORS_2D
    palette = [jnp.asarray(parse_color(c), dtype=jnp.float32) for c in colors]
    fx = flow[..., 0].astype(jnp.float32)[..., None]
    fy = flow[..., 1].astype(jnp.float32)[..., None]
    coeff_y = jnp.clip(1.0 + scale * fx, 0.0, 1.0)
    coeff_b = jnp.clip(1.0 - scale * fx, 0.0, 1.0)
    coeff_m = jnp.clip(1.0 + scale * fy, 0.0, 1.0)
    coeff_g = jnp.clip(1.0 - scale * fy, 0.0, 1.0)
    frame = 0.5 * (coeff_y * palette[0] + coeff_b * palette[1]
                   + coeff_m * palette[2] + coeff_g * palette[3])
    return jnp.clip(frame, 0, 255).astype(jnp.uint8)


def flow_magnitude(flow):
    return jnp.sqrt(jnp.sum(jnp.square(flow.astype(jnp.float32)), axis=-1))
