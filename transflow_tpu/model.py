"""FlowTransferModel — the flagship fused device program.

One object bundles the whole per-frame computation (estimator ->
post-process -> merge -> upscale -> compositor update -> render) as a pure
``step`` plus a ``lax.scan``'d chunk form that amortizes dispatch and lets
XLA pipeline the recurrence across frames. This is what bench.py measures
and what __graft_entry__ exposes; Pipeline uses the same building blocks one
frame at a time (engine.py) because host IO is streaming.
"""
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .compositor.core import build_compositor, make_layer_params
from .config import LayerConfig
from .flow import Direction
from .flow.estimators import get_estimator
from .flow.merge import get_merge_function
from .flow.transforms import make_postprocess
from .ops.image import upscale_flow


class FlowTransferModel:

    def __init__(self,
                 height: int,
                 width: int,
                 layer_cfgs: Sequence[LayerConfig] | None = None,
                 sources_by_layer: dict | None = None,
                 method: str = "farneback",
                 estimator_kwargs: dict | None = None,
                 direction: Direction = Direction.BACKWARD,
                 flow_filters: str | None = None,
                 mask: np.ndarray | None = None,
                 kernel: np.ndarray | None = None,
                 background_color: str = "#ffffff",
                 width_factor: int = 1,
                 height_factor: int = 1,
                 framerate: float = 30.0,
                 halo: int | None = None,
                 mesh=None):
        self.height = height
        self.width = width
        self.out_height = height * height_factor
        self.out_width = width * width_factor
        self.framerate = framerate
        if layer_cfgs is None:
            layer_cfgs = [LayerConfig(0)]
        if sources_by_layer is None:
            sources_by_layer = {
                0: [(3, np.ones((self.out_height, self.out_width), bool))]}
        self.layer_params = make_layer_params(
            layer_cfgs, self.out_height, self.out_width, sources_by_layer)
        # halo: bounded-displacement movement gather for H-sharded meshes —
        # neighbor-row exchanges instead of per-frame full-state all-gathers
        # (parallel/mesh.py has the measurements); None = plain gather.
        # mesh: with an explicit mesh whose 'space' axis splits H, the halo
        # gather runs as manual SPMD (one local gather + two neighbor-row
        # ppermutes, ops/halo_gather.py::sharded_bounded_gather) instead of
        # the 2*halo+1-shift GSPMD formulation
        self.halo = halo
        init_fn, comp_step = build_compositor(
            self.layer_params, self.out_height, self.out_width,
            background_color, halo=halo, mesh=mesh)
        self._comp_init = init_fn
        self._comp_step = comp_step
        estimator = get_estimator(method)
        estimator_kwargs = dict(estimator_kwargs or {})
        postprocess = make_postprocess(flow_filters, mask, kernel, direction)
        merge = get_merge_function("first")
        wf, hf = width_factor, height_factor
        takes_prev = method in ("farneback", "horn-schunck")
        # CNN weights travel as program arguments (engine.make_estimator_step
        # has the measurements: literals/closure-captured buffers are 7x+
        # slower); () for the classic estimators
        if method == "liteflownet":
            from .flow.estimators.liteflownet import get_weights
            self.est_params = get_weights()
        else:
            self.est_params = ()

        def estimate(prev_gray, gray, prev_flow, est_params):
            if direction == Direction.FORWARD:
                left, right = prev_gray, gray
            else:
                left, right = gray, prev_gray
            if method == "liteflownet":
                # kwargs MUST flow through: corr_kernel/corr_mesh select
                # the GSPMD-safe correlation under sharded_scan meshes
                # (dropping them here silently dispatched the plain Pallas
                # kernel, which cannot trace over sharded operands)
                return estimator(left, right, params=est_params,
                                 **estimator_kwargs)
            if takes_prev:
                return estimator(left, right, prev_flow, **estimator_kwargs)
            return estimator(left, right, **estimator_kwargs)

        self.pp_mask = (None if postprocess.mask is None
                        else jax.device_put(postprocess.mask))

        def step(state, gray, pixmaps, t, key, frame_numbers, params_list,
                 pp_mask=None, est_params=()):
            raw = estimate(state["prev_gray"], gray, state["prev_flow"],
                           est_params)
            flow = merge([postprocess(raw, t, pp_mask)])
            if wf != 1 or hf != 1:
                flow = upscale_flow(flow, wf, hf)
            comp = self._comp_step.update(state["comp"], flow, pixmaps, key,
                                          frame_numbers, params_list)
            comp, rgb = self._comp_step.render(comp, params_list)
            new_state = {"comp": comp, "prev_gray": gray, "prev_flow": raw}
            return new_state, rgb

        self._step = step

    # ------------------------------------------------------------------

    def init_state(self, first_gray) -> dict:
        return {
            "comp": self._comp_init(),
            "prev_gray": jnp.asarray(first_gray, dtype=jnp.uint8),
            "prev_flow": jnp.zeros((self.height, self.width, 2),
                                   dtype=jnp.float32),
        }

    def default_pixmaps(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        return tuple(
            tuple(jnp.asarray(rng.integers(0, 256,
                                           (self.out_height, self.out_width,
                                            channels), dtype=np.uint8))
                  for channels in params.channel_counts)
            for params in self.layer_params)

    def default_frame_numbers(self, value: int = 0):
        return tuple(tuple(value for _ in params.channel_counts)
                     for params in self.layer_params)

    def step(self, state, gray, pixmaps, t, key, frame_numbers,
             params_list=None, pp_mask=None, est_params=None):
        """Pure single-frame step (jit-able). ``params_list`` defaults to the
        model's own LayerParams — pass it explicitly under jit so the mask
        arrays travel as arguments (see LayerParams docstring)."""
        if params_list is None:
            params_list = self.layer_params
        if pp_mask is None:
            pp_mask = self.pp_mask
        if est_params is None:
            est_params = self.est_params
        return self._step(state, gray, pixmaps, t, key, frame_numbers,
                          params_list, pp_mask, est_params)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _jit_step(self, state, gray, pixmaps, t, key, frame_numbers,
                  params_list, pp_mask, est_params):
        return self._step(state, gray, pixmaps, t, key, frame_numbers,
                          params_list, pp_mask, est_params)

    def jit_step(self, state, gray, pixmaps, t, key, frame_numbers):
        # layer params enter as jit arguments, NOT via the static self
        # (attribute reads during tracing would bake them in as constants)
        return self._jit_step(state, gray, pixmaps, t, key, frame_numbers,
                              self.layer_params, self.pp_mask,
                              self.est_params)

    def scan(self, state, grays, pixmaps, t0, key, params_list=None,
             pp_mask=None, frame0: int = 0, est_params=None):
        """Process a (K, H, W) chunk of frames in one fused device program.

        The temporal recurrence is sequential (state(t) depends on t-1,
        SURVEY §2.3), so frames run under lax.scan; all within-frame work is
        data-parallel and shards spatially (parallel/)."""
        if params_list is None:
            params_list = self.layer_params
        if pp_mask is None:
            pp_mask = self.pp_mask
        if est_params is None:
            est_params = self.est_params
        k = grays.shape[0]
        keys = jax.random.split(key, k)
        ts = t0 + jnp.arange(k, dtype=jnp.float32) / self.framerate
        frame_nos = frame0 + jnp.arange(k, dtype=jnp.int32)

        def body(carry, inputs):
            gray, t, subkey, fno = inputs
            frame_numbers = tuple(tuple(fno for _ in p.channel_counts)
                                  for p in self.layer_params)
            new_state, rgb = self._step(carry, gray, pixmaps, t, subkey,
                                        frame_numbers, params_list, pp_mask,
                                        est_params)
            return new_state, rgb

        return jax.lax.scan(body, state, (grays, ts, keys, frame_nos))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _jit_scan(self, state, grays, pixmaps, t0, key, params_list,
                  pp_mask, est_params):
        return self.scan(state, grays, pixmaps, t0, key, params_list,
                         pp_mask, est_params=est_params)

    def jit_scan(self, state, grays, pixmaps, t0, key):
        return self._jit_scan(state, grays, pixmaps, t0, key,
                              self.layer_params, self.pp_mask,
                              self.est_params)
