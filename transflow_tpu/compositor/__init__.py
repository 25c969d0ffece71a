"""Stateful host-facing Compositor wrapper over the functional core.

Mirrors the reference API surface (transflow/compositor/compositor.py:17-53:
from_args / update / render / set_sources) while keeping all state on device.
The hot path for batch rendering is the pure step function in core.py driven
by the pipeline's lax.scan; this class is the convenience/interactive API.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LayerConfig
from .core import (LayerParams, build_compositor, init_layer_state,
                   make_layer_params, render_layer, update_introduction,
                   update_moveref, update_static, update_sum)

__all__ = [
    "Compositor", "LayerParams", "build_compositor", "init_layer_state",
    "make_layer_params", "render_layer", "update_introduction",
    "update_moveref", "update_static", "update_sum",
]


class Compositor:

    def __init__(self, height: int, width: int,
                 layer_cfgs: Sequence[LayerConfig],
                 sources_by_layer: dict,
                 background_color: str = "#ffffff",
                 seed: int = 0):
        self.height = height
        self.width = width
        self.layer_cfgs = list(layer_cfgs)
        self.background_color = background_color
        self.layer_params = make_layer_params(
            layer_cfgs, height, width, sources_by_layer)
        init_fn, step_fn = build_compositor(
            self.layer_params, height, width, background_color)
        self._step = step_fn
        self._jit_update = jax.jit(step_fn.update)
        self._jit_render = jax.jit(step_fn.render)
        self.state = init_fn()
        self.key = jax.random.PRNGKey(seed)
        # per-layer lists of current pixmaps + frame numbers, fed by the host
        self.pixmaps: list[list] = [
            [jnp.zeros((height, width, c), dtype=jnp.uint8)
             for c in p.channel_counts]
            for p in self.layer_params]
        self.frame_numbers: list[list[int]] = [
            [0] * p.num_sources for p in self.layer_params]

    @classmethod
    def from_args(cls, height: int, width: int,
                  layer_cfgs: Sequence[LayerConfig],
                  background_color: str = "#ffffff",
                  sources_by_layer: dict | None = None,
                  seed: int = 0) -> "Compositor":
        return cls(height, width, layer_cfgs,
                   sources_by_layer if sources_by_layer is not None else {},
                   background_color, seed)

    def set_pixmap(self, layer_pos: int, source_pos: int, pixmap,
                   frame_number: int | None = None):
        """Feed the next frame of a pixmap source (host numpy or device)."""
        self.pixmaps[layer_pos][source_pos] = jnp.asarray(pixmap)
        if frame_number is None:
            frame_number = self.frame_numbers[layer_pos][source_pos] + 1
        self.frame_numbers[layer_pos][source_pos] = frame_number

    def _args(self):
        pixmaps = tuple(tuple(src) for src in self.pixmaps)
        frames = tuple(tuple(jnp.int32(n) for n in src)
                       for src in self.frame_numbers)
        return pixmaps, frames

    def update(self, flow):
        self.key, sub = jax.random.split(self.key)
        pixmaps, frames = self._args()
        self.state = self._jit_update(
            self.state, jnp.asarray(flow, dtype=jnp.float32), pixmaps, sub,
            frames, self.layer_params)

    def render(self) -> np.ndarray:
        self.state, image = self._jit_render(self.state, self.layer_params)
        return np.asarray(image)
