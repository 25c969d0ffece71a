"""Device engine: assembles estimation + post-process + merge + upscale +
compositor into jitted steps and owns all device-resident state.

This replaces the reference's process/queue dataflow
(transflow/pipeline.py:56-136 SourceProcess/OutputProcess and the per-frame
numpy compositor calls :545-596) with a single device program per frame:
host threads only decode/encode; everything between the uint8 frame upload
and the uint8 RGB readback runs on the TPU.
"""
import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .compositor.core import LayerParams, build_compositor
from .config import Config
from .flow import Direction
from .flow.estimators import get_estimator
from .flow.merge import get_merge_function
from .flow.sources.base import FlowItem, FlowSource
from .ops.image import upscale_flow
from .ops.render import flow_magnitude, render1d, render2d

logger = logging.getLogger(__name__)


class SourceRuntime:
    """Device-side state for one flow source.

    ``put``: upload function for (H, W[, C]) arrays — plain device_put on
    one chip, H-sharded placement under a ('space',) mesh."""

    def __init__(self, source: FlowSource, estimator_step, put=None,
                 params_put=None, mesh=None):
        self.source = source
        self.estimator_step = estimator_step  # None for flow-yielding sources
        self.put = put if put is not None else jax.device_put
        # weight placement for rebuilt steps: under a mesh the params must
        # be replicated onto every device (same as Engine.__init__ does)
        self.params_put = params_put
        self.mesh = mesh
        self.prev_gray = None
        self.prev_flow = None
        self.last_raw = None
        self._cfg_version = getattr(getattr(source, "config", None),
                                    "version", None)

    def _maybe_rejit(self):
        """Live tuning support: the config window bumps config.version;
        rebuild the jitted estimator with the new hyper-parameters."""
        config = getattr(self.source, "config", None)
        if config is None or config.version == self._cfg_version:
            return
        self._cfg_version = config.version
        self.estimator_step = make_estimator_step(
            config.method,
            mesh_safe_estimator_kwargs(config, self.mesh),
            self.source.direction)
        if self.params_put is not None and self.estimator_step.params != ():
            self.estimator_step.params = jax.tree.map(
                self.params_put, self.estimator_step.params)

    def reset(self, prime_frame: np.ndarray):
        h, w = self.source.height, self.source.width
        self.prev_gray = self.put(np.asarray(prime_frame))
        self.prev_flow = self.put(np.zeros((h, w, 2), dtype=np.float32))

    def ingest(self, item: FlowItem):
        """Consume a FlowItem, return the raw device flow for this tick."""
        if item.kind == FlowItem.REPLAY:
            if item.discarded is not None:
                self._advance(item.discarded, keep=False)
            if self.last_raw is None:
                raise RuntimeError("Lock replay before first flow")
            return self.last_raw
        return self._advance(item, keep=True)

    def _advance(self, item: FlowItem, keep: bool):
        if item.kind == FlowItem.FLOW:
            raw = self.put(np.asarray(item.array, dtype=np.float32))
        else:
            if item.prime is not None:
                self.reset(item.prime)
            self._maybe_rejit()
            gray = self.put(np.asarray(item.array))
            raw = self.estimator_step(self.prev_gray, gray, self.prev_flow)
            self.prev_gray = gray
            if keep:
                self.prev_flow = raw
        if keep:
            self.last_raw = raw
        return raw


def mesh_safe_kwargs(kwargs: dict, method: str, mesh) -> dict:
    """Estimator kwargs adjusted for GSPMD execution under ``mesh``.

    Pallas kernels are tpu_custom_calls with no SPMD partitioning rule,
    so they cannot trace over GSPMD-sharded operands. The bounded warp
    behind lfn_warp_bound is therefore stripped (exact gather path). The
    correlation band kernel — the one the TPU backend dispatches to by
    default — keeps running through its manual-SPMD entry point instead:
    'pallas_halo' wraps it in shard_map with boundary-row collective-
    permutes (ops/pallas_correlation.sharded_pallas_correlation7x7);
    pyramid levels whose H doesn't split over the mesh fall back to the
    XLA shift formulation at trace time.

    ``mesh``: any mesh with a 'space' axis (the Engine's 1-axis
    ('space',) mesh, or sharded_scan's ('stream', 'space')), or None
    off-mesh. The single source of these rules — the Engine and
    extra/batch_render.py both route through here."""
    kwargs = dict(kwargs)
    if mesh is not None and kwargs.get("warp_bound"):
        logger.warning(
            "lfn_warp_bound=%s is ignored under --mesh (the Pallas warp "
            "kernel has no SPMD partitioning rule); using the exact "
            "gather path", kwargs["warp_bound"])
        kwargs["warp_bound"] = 0
    if mesh is not None and method == "liteflownet":
        kwargs["corr_kernel"] = "pallas_halo"
        kwargs["corr_mesh"] = mesh
    return kwargs


def mesh_safe_estimator_kwargs(config, mesh) -> dict:
    """``mesh_safe_kwargs`` over a flow-source config's estimator kwargs."""
    return mesh_safe_kwargs(config.estimator_kwargs(), config.method, mesh)


def make_estimator_step(method: str, estimator_kwargs: dict,
                        direction: Direction):
    """(prev_gray, gray, prev_flow) -> raw flow for one source.

    Frame ordering parity: transflow/flow/sources/cv.py:467-474 (forward
    pairs (prev, next); backward pairs (next, prev)).

    The returned callable is jitted for per-frame use. Model weights (the
    CNN estimator) travel as the ``step.params`` pytree and are passed as
    jit ARGUMENTS — baked-in literals compile to a ~7x slower program, and
    closure-captured device buffers re-sync per call. The chunk scan calls
    the un-jitted ``step.fn(prev, gray, prev_flow, params)`` and threads
    ``step.params`` through its own program arguments for the same
    reason."""
    estimator = get_estimator(method)
    if method == "liteflownet":
        from .flow.estimators.liteflownet import get_weights
        est_params = get_weights()
    else:
        est_params = ()

    def fn(prev_gray, gray, prev_flow, params):
        if direction == Direction.FORWARD:
            left, right = prev_gray, gray
        else:
            left, right = gray, prev_gray
        if method in ("farneback", "horn-schunck"):
            return estimator(left, right, prev_flow, **estimator_kwargs)
        if method == "liteflownet":
            return estimator(left, right, params=params,
                             **estimator_kwargs)
        return estimator(left, right, **estimator_kwargs)

    jitted = jax.jit(fn)

    def step(prev_gray, gray, prev_flow):
        return jitted(prev_gray, gray, prev_flow, step.params)

    step.fn = fn
    step.params = est_params
    return step


class Engine:
    """Owns the fused per-frame device program + device state."""

    def __init__(self,
                 cfg: Config,
                 flow_sources: Sequence[FlowSource],
                 layer_params: Sequence[LayerParams],
                 out_height: int,
                 out_width: int,
                 width_factor: int = 1,
                 height_factor: int = 1,
                 export_flows: bool = False,
                 mesh=None,
                 halo: int | None = None):
        """``mesh``: a 1-axis ('space',) jax Mesh — every (H, W[, C])
        recurrence array is H-sharded across its devices and the fused
        programs run under GSPMD (pixmaps/masks/weights replicated,
        parallel/mesh.py has the layout rationale). ``halo``: bounded
        movement-gather displacement so shard-boundary reads become
        neighbor-row collective-permutes instead of per-frame full-state
        all-gathers; pair with a clip filter for exactness."""
        self.cfg = cfg
        self.out_height = out_height
        self.out_width = out_width
        self.width_factor = width_factor
        self.height_factor = height_factor
        self.mesh = mesh
        self.halo = halo
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from .parallel.mesh import space_chunk_spec, space_state_spec

            def put_state(x):
                x = np.asarray(x)
                return jax.device_put(x, NamedSharding(
                    mesh, space_state_spec(x.ndim)))

            def put_chunk(x):
                x = np.asarray(x)
                return jax.device_put(x, NamedSharding(
                    mesh, space_chunk_spec(x.ndim)))

            def put_repl(x):
                return jax.device_put(x, NamedSharding(
                    mesh, PartitionSpec()))
        else:
            put_state = put_chunk = put_repl = jax.device_put
        self._put_state = put_state
        self._put_chunk = put_chunk
        self._put_repl = put_repl
        self.key = jax.random.key(cfg.seed)  # typed key: clean (de)serialization
        self.runtimes: list[SourceRuntime] = []
        for source in flow_sources:
            estimator_step = None
            if source.yields_frames:
                estimator_step = make_estimator_step(
                    source.config.method,
                    mesh_safe_estimator_kwargs(source.config, mesh),
                    source.direction)
                if mesh is not None and estimator_step.params != ():
                    estimator_step.params = jax.tree.map(
                        put_repl, estimator_step.params)
            self.runtimes.append(
                SourceRuntime(source, estimator_step, put=put_state,
                              params_put=(put_repl if mesh is not None
                                          else None),
                              mesh=mesh))
        postprocesses = [src.build_postprocess() for src in flow_sources]
        merge = get_merge_function(cfg.flows_merging_function)
        if mesh is not None:
            layer_params = jax.tree.map(put_repl, layer_params)
        self.layer_params = layer_params
        init_fn, comp_step = build_compositor(
            layer_params, out_height, out_width, cfg.compositor_background,
            halo=halo, mesh=mesh)
        self.comp_state = init_fn()
        if mesh is not None:
            self.comp_state = jax.tree.map(put_state, self.comp_state)
        render_mode = ("flow" if cfg.view_flow
                       else "magnitude" if cfg.view_flow_magnitude
                       else "compositor" if any(
                           p.num_sources for p in layer_params) else None)
        self.render_mode = render_mode
        wf, hf = width_factor, height_factor
        # flow masks travel as jit args (not closure constants — see
        # LayerParams docstring for why); device_put once, reused every frame
        # ((H, W) at flow resolution: H-sharded under a mesh, elementwise use)
        self._pp_masks = tuple(
            None if pp.mask is None else put_state(pp.mask)
            for pp in postprocesses)

        def device_step(comp_state, raw_flows, t, pixmaps, key,
                        frame_numbers, params_list, pp_masks):
            processed = [pp(raw, t, m) for pp, raw, m
                         in zip(postprocesses, raw_flows, pp_masks)]
            flow = merge(processed)
            if wf != 1 or hf != 1:
                flow = upscale_flow(flow, wf, hf)
            comp_state = comp_step.update(comp_state, flow, pixmaps, key,
                                          frame_numbers, params_list)
            if render_mode == "flow":
                frame = render2d(flow, cfg.render_scale, cfg.render_colors)
            elif render_mode == "magnitude":
                frame = render1d(flow_magnitude(flow), cfg.render_scale,
                                 cfg.render_colors, cfg.render_binary)
            elif render_mode == "compositor":
                comp_state, frame = comp_step.render(comp_state, params_list)
            else:
                frame = jnp.zeros((out_height, out_width, 3), dtype=jnp.uint8)
            return comp_state, frame, flow

        # donate the compositor state: it is replaced every frame, and
        # donation lets XLA update the (H, W) buffers in place
        self._device_step = jax.jit(device_step, donate_argnums=(0,))

        frame_numbers0 = tuple(
            tuple(0 for _ in p.channel_counts) for p in layer_params)

        def scan_step_tail(comp_state, key, raws, t, fno, chunk_k,
                           const_pixmaps, params_list, pp_masks):
            """The per-step compositor half of the scan body: the RNG
            split, pixmap const/chunk merge, frame-number tree and
            device_step call — the exact arithmetic the chunked==per-frame
            bit-equality guarantee rests on lives only here. ``raws`` is
            the per-source tuple of raw flows (merged inside
            device_step, same as process_frame)."""
            key, subkey = jax.random.split(key)
            pixmaps = tuple(
                tuple(const if chunk is None else chunk
                      for const, chunk in zip(const_layer, chunk_layer))
                for const_layer, chunk_layer
                in zip(const_pixmaps, chunk_k))
            frame_numbers = jax.tree.map(lambda _: fno, frame_numbers0)
            comp_state, frame, flow = device_step(
                comp_state, raws, t, pixmaps, subkey, frame_numbers,
                params_list, pp_masks)
            # export_flows is a static construction-time flag: flows are
            # only stacked (K, H, W, 2 extra HBM + transfer) when a
            # .flow.zip is actually being written
            out = (frame, flow) if export_flows else (frame, ())
            return comp_state, key, out

        def device_scan(comp_state, prev_grays, prev_flows, key, chunks,
                        ts, const_pixmaps, pix_chunks, frame0, params_list,
                        pp_masks, est_params):
            """lax.scan over N per-source chunks — one dispatch per chunk
            instead of per frame, for ANY mix of flow sources (the
            reference's multi-flow ``--flow`` + merge mainline,
            transflow/pipeline.py:149-158,496-507, batches too).

            Per source i, ``chunks[i]`` is a (K, H, W) uint8 gray chunk
            (frame-yielding source: estimated in the scan body with the
            (prev_gray, prev_flow) warm-start carried across steps) or a
            (K, H, W, 2) float32 raw-flow chunk (flow-yielding source —
            archive replay / motion vectors, the reference's fastest
            modes: no estimation, no carry; its ``prev_grays[i]`` /
            ``prev_flows[i]`` slots are None). The per-step raws tuple
            feeds the same post-process + merge as process_frame.

            Pixmap slots come in two static structures: ``const_pixmaps``
            holds (H, W, C) device arrays for constant sources (None in
            video slots) and ``pix_chunks`` holds (K, H, W, C) stacked
            decoded frames for video sources (None in constant slots) —
            the stacked slots are scanned over, so the reference's
            mainline ``flow.mp4 -p pixmap.mp4`` case batches too
            (transflow/pipeline.py:379-438 streams video pixmaps).

            The RNG key travels in the scan CARRY and splits once per step
            exactly like process_frame, and ``ts`` arrives as a host-built
            (K,) float32 array computed with the per-frame path's exact
            float64 arithmetic (f32(t0) + f32(k)/fr differs by 1 ULP for
            ~quarter of frames — enough to flip a .5-rounding pixel under
            t-dependent expressions), so chunked output is bit-equal to
            the per-frame path including random resets."""
            # NOTE: bound at trace time — chunked mode does not follow live
            # estimator re-tuning (the pipeline gates batching accordingly)
            steps = tuple(rt.estimator_step for rt in self.runtimes)
            k = ts.shape[0]
            frame_nos = frame0 + jnp.arange(k, dtype=jnp.int32)

            def body(carry, inputs):
                comp_state, prev_grays, prev_flows, key = carry
                per_source, t, fno, chunk_k = inputs
                raws, next_grays, next_flows = [], [], []
                for i, step in enumerate(steps):
                    if step is None:  # flow-yielding: the input IS the raw
                        raws.append(per_source[i])
                        next_grays.append(None)
                        next_flows.append(None)
                    else:
                        # weights as scan-program args, not trace constants
                        raw = step.fn(prev_grays[i], per_source[i],
                                      prev_flows[i], est_params[i])
                        raws.append(raw)
                        next_grays.append(per_source[i])
                        next_flows.append(raw)
                comp_state, key, out = scan_step_tail(
                    comp_state, key, tuple(raws), t, fno, chunk_k,
                    const_pixmaps, params_list, pp_masks)
                return (comp_state, tuple(next_grays), tuple(next_flows),
                        key), out

            ((comp_state, prev_grays, prev_flows, key),
             (frames, flows)) = jax.lax.scan(
                body, (comp_state, prev_grays, prev_flows, key),
                (chunks, ts, frame_nos, pix_chunks))
            return comp_state, prev_grays, prev_flows, key, frames, flows

        self._device_scan = jax.jit(device_scan, donate_argnums=(0, 1, 2))
        self._framerate = 30.0  # set by the pipeline before chunking

    # ------------------------------------------------------------------

    def process_chunk(self, source_chunks, const_pixmaps,
                      pix_chunks, base_frame: int, frame0: int):
        """Process stacked chunks through one scanned dispatch.

        ``source_chunks``: one stacked host array per flow source — a
        (K, H, W) uint8 gray chunk for a frame-yielding source (estimated
        inside the scan with its warm-start carry) or a (K, H, W, 2)
        raw-flow chunk for a flow-yielding one (archive replay, motion
        vectors: no estimation). Any mix batches, including the
        reference's multi-flow merge mainline
        (transflow/pipeline.py:149-158,496-507).
        ``const_pixmaps``/``pix_chunks``: per-layer tuples
        of per-source slots — constant sources carry their persistent
        (H, W, C) device array in the first structure (None in the second);
        video sources carry a stacked (K, H, W, C) host chunk in the second
        (None in the first). Returns the K rendered frames as one device
        array, plus the K post-processed flows when the engine was built
        with ``export_flows`` (else ``()``)."""
        # pixmaps replicate under a mesh: the render gather's reach through
        # the accumulated mapping is unbounded (parallel/mesh.py)
        pix_chunks = jax.tree.map(
            lambda x: self._put_repl(np.ascontiguousarray(x)), pix_chunks)
        # float64 on host, cast once: matches the per-frame path's
        # jnp.float32((base + k) / framerate) to the last bit
        ts = np.float32((base_frame + np.arange(len(source_chunks[0])))
                        / self._framerate)
        chunks, prev_grays, prev_flows, est_params = [], [], [], []
        for runtime, chunk in zip(self.runtimes, source_chunks):
            if runtime.estimator_step is None:
                # flow-yielding: the stacked chunk IS the raw flows
                chunks.append(self._put_chunk(np.ascontiguousarray(
                    np.asarray(chunk, dtype=np.float32))))
                prev_grays.append(None)
                prev_flows.append(None)
                est_params.append(())
            else:
                runtime._maybe_rejit()
                chunks.append(self._put_chunk(np.ascontiguousarray(chunk)))
                prev_grays.append(runtime.prev_gray)
                prev_flows.append(runtime.prev_flow)
                est_params.append(runtime.estimator_step.params)
        (self.comp_state, prev_grays, prev_flows, self.key,
         frames, flows) = self._device_scan(
            self.comp_state, tuple(prev_grays), tuple(prev_flows), self.key,
            tuple(chunks), jnp.asarray(ts), const_pixmaps, pix_chunks,
            jnp.int32(frame0), self.layer_params, self._pp_masks,
            tuple(est_params))
        for i, runtime in enumerate(self.runtimes):
            if runtime.estimator_step is None:
                runtime.last_raw = chunks[i][-1]
            else:
                runtime.prev_gray = prev_grays[i]
                runtime.prev_flow = prev_flows[i]
                runtime.last_raw = prev_flows[i]
        return frames, flows

    def process_frame(self, items: Sequence[FlowItem], pixmaps, t: float,
                      frame_numbers):
        """One frame: items (one per flow source) -> (rgb, flow) device arrays.

        ``pixmaps``: tuple per layer of tuples per source of device uint8
        arrays; ``frame_numbers`` mirrors it with ints."""
        raw_flows = tuple(rt.ingest(item)
                          for rt, item in zip(self.runtimes, items))
        self.key, sub = jax.random.split(self.key)
        self.comp_state, frame, flow = self._device_step(
            self.comp_state, raw_flows, jnp.float32(t), pixmaps, sub,
            frame_numbers, self.layer_params, self._pp_masks)
        return frame, flow

    # ------------------------------------------------------------------
    # checkpoint support
    # ------------------------------------------------------------------

    def state_arrays(self) -> dict:
        """Flatten compositor state + RNG key into named numpy arrays."""
        out = {"rng_key": np.asarray(jax.random.key_data(self.key))}
        for idx, layer_state in enumerate(self.comp_state):
            for name, value in layer_state.items():
                out[f"layer{idx}.{name}"] = np.asarray(value)
        return out

    def load_state_arrays(self, arrays: dict):
        if "rng_key" in arrays:
            self.key = jax.random.wrap_key_data(jnp.asarray(arrays["rng_key"]))
        new_state = []
        for idx, layer_state in enumerate(self.comp_state):
            loaded = {}
            for name, value in layer_state.items():
                stored = arrays.get(f"layer{idx}.{name}")
                if stored is None:
                    loaded[name] = value
                else:
                    # cast to the live carry dtype: checkpoints written
                    # before the round-4 state compaction (docs/PERF.md)
                    # store int32 mapping/alpha/source leaves
                    loaded[name] = self._put_state(
                        np.asarray(stored).astype(np.asarray(value).dtype,
                                                  copy=False))
            new_state.append(loaded)
        self.comp_state = new_state
